"""Recursion circuit: PolyExtStep interpreter + seal verification.

Reference parity: risc0/circuit/recursion/src/{taps.rs,poly_ext.rs,info.rs,
control_id.rs}; interpreter semantics risc0/zkp/src/adapter.rs:152-401.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

from ... import field as F
from ..rv32im.circuit import _taps_to_tapset

CIRCUIT_INFO = b"RECURSION:rev1v1"  # reference recursion/src/info.rs:23
OUTPUT_SIZE = 32
MIX_SIZE = 20
RECURSION_PO2 = 18  # reference zkvm/src/host/recursion/prove/mod.rs:58

_DATA = os.path.join(os.path.dirname(__file__), "data")

CONST, CONSTEXT, GET, GETGLOBAL, ADD, SUB, MUL, TRUE, ANDEQZ, ANDCOND = range(10)


def _load_ids():
    return np.load(os.path.join(_DATA, "control_ids.npz"))


ALLOWED_CONTROL_ROOT = None  # populated on first load_circuit()


class RecursionCircuit:
    def __init__(self, taps, opcode, operands, ret):
        self.taps = taps
        self.CIRCUIT_INFO = CIRCUIT_INFO
        self.OUTPUT_SIZE = OUTPUT_SIZE
        self.MIX_SIZE = MIX_SIZE
        self.opcode = opcode
        self.operands = operands
        self.ret = int(ret)

    def poly_ext(self, poly_mix, eval_u, out, mix):
        """PolyExtStep executor (adapter.rs:327-401); returns MixState.tot."""
        em, ea, es = F.ext_mul_np, F.add_np, F.sub_np
        pmix = np.asarray(poly_mix, np.uint32)
        eval_u = np.asarray(eval_u, np.uint32)
        args = [np.asarray(out, np.uint32), np.asarray(mix, np.uint32)]

        fp_vars = []
        mix_vars = []  # list of (tot, mul)

        def embed_std(v):
            o = np.zeros(4, np.uint32)
            o[0] = F.s_encode(int(v) % F.P)
            return o

        def embed_mont(v):
            o = np.zeros(4, np.uint32)
            o[0] = int(v)
            return o

        for op, row in zip(self.opcode, self.operands):
            a, b, c, d = (int(x) for x in row)
            if op == CONST:
                fp_vars.append(embed_std(a))
            elif op == CONSTEXT:
                fp_vars.append(F.encode_np(np.array([a, b, c, d], np.uint32)))
            elif op == GET:
                fp_vars.append(eval_u[a])
            elif op == GETGLOBAL:
                fp_vars.append(embed_mont(args[a][b]))
            elif op == ADD:
                fp_vars.append(ea(fp_vars[a], fp_vars[b]))
            elif op == SUB:
                fp_vars.append(es(fp_vars[a], fp_vars[b]))
            elif op == MUL:
                fp_vars.append(em(fp_vars[a], fp_vars[b]))
            elif op == TRUE:
                zero = np.zeros(4, np.uint32)
                one = np.zeros(4, np.uint32)
                one[0] = F.R % F.P
                mix_vars.append((zero, one))
            elif op == ANDEQZ:
                tot, mul = mix_vars[a]
                inner = fp_vars[b]
                mix_vars.append((ea(tot, em(mul, inner)), em(mul, pmix)))
            elif op == ANDCOND:
                tot, mul = mix_vars[a]
                cond = fp_vars[b]
                itot, imul = mix_vars[c]
                mix_vars.append(
                    (ea(tot, em(em(cond, itot), mul)), em(mul, imul)))
            else:
                raise ValueError(f"bad opcode {op}")
        return mix_vars[self.ret][0]


@lru_cache(maxsize=1)
def load_circuit() -> RecursionCircuit:
    global ALLOWED_CONTROL_ROOT
    tz = np.load(os.path.join(_DATA, "taps.npz"))
    pe = np.load(os.path.join(_DATA, "poly_ext.npz"))
    ids = _load_ids()
    ALLOWED_CONTROL_ROOT = ids["ALLOWED_CONTROL_ROOT"]
    taps = _taps_to_tapset(tz)
    return RecursionCircuit(taps, pe["opcode"], pe["operands"], pe["ret"])


def verify_recursion_seal(seal, check_control_id=None,
                          suite=None) -> np.ndarray:
    """Verify a recursion-circuit seal (the inner check of SuccinctReceipt
    verification, reference receipt/succinct.rs:103-190).  `check_control_id`
    receives (po2, code_root) to validate program membership.  `suite`
    selects the transcript hash suite (poseidon254 for identity_p254
    receipts)."""
    from ...hash.suite import POSEIDON2
    from ...verify import verifier as V

    circuit = load_circuit()
    return V.verify(circuit, suite or POSEIDON2, np.asarray(seal, np.uint32),
                    check_control_id or (lambda po2, root: None))


@lru_cache(maxsize=1)
def load_prover_circuit():
    """Prover-side circuit: taps + constraint-poly IR (from the generated
    poly_fp.cpp, scripts/extract_recursion_poly.py) in the shared
    Rv32imCircuit machinery — used for eval_check during proving."""
    from ..rv32im.circuit import Rv32imCircuit, _taps_to_tapset

    tz = np.load(os.path.join(_DATA, "taps.npz"))
    ir = np.load(os.path.join(_DATA, "poly_fp_ir.npz"), allow_pickle=True)
    taps = _taps_to_tapset(tz)
    c = Rv32imCircuit(
        taps, ir["opcode"], ir["operands"], ir["n_f"], ir["n_e"],
        ir["fscr_size"], ir["escr_size"], ir["ret"],
        ir["mix_powers"] if "mix_powers" in ir.files else None)
    c.CIRCUIT_INFO = CIRCUIT_INFO
    c.OUTPUT_SIZE = OUTPUT_SIZE
    c.MIX_SIZE = MIX_SIZE
    return c
