"""Keccak batch proving (reference keccak/src/prove/mod.rs:100-182).

Seal flow: proof-system + circuit info commits, globals||po2 header,
code/data commits, Fiat-Shamir mix, all-zero accum commit, generic
DEEP-ALI/FRI finalize.  No seal version word.
"""

from __future__ import annotations

import numpy as np

from ... import field as F
from ...hash.suite import POSEIDON2
from ...prove.prover import Prover
from ...taps import (REGISTER_GROUP_ACCUM, REGISTER_GROUP_CODE,
                     REGISTER_GROUP_DATA)
from ...verify import verifier as V
from .circuit import load_circuit
from .witgen import (REGCOUNT_ACCUM, REGCOUNT_MIX, witgen_keccak)


class _KeccakHal:
    """eval_check via the straight-line numpy IR evaluator (the keccak
    poly is small enough per-chunk; plan scheduling is a perf follow-up)."""

    def __init__(self, circuit):
        self.circuit = circuit

    def eval_check(self, groups, globals_list, poly_mix, po2):
        groups = [np.asarray(g) for g in groups]
        return self.circuit.eval_check_np(groups, globals_list, poly_mix,
                                          po2)


def prove_keccak(inputs, po2, suite=None, use_plan=True):
    """Prove a batch of keccak-f permutations; returns the seal."""
    import jax.numpy as jnp

    suite = suite or POSEIDON2
    circuit = load_circuit()
    res = witgen_keccak(inputs, po2)
    cycles = res["rows"]

    data_m = F.encode_np(res["data"])
    global_m = F.encode_np(res["global"])
    code_m = np.zeros((1, cycles), np.uint32)
    accum_m = np.zeros((REGCOUNT_ACCUM, cycles), np.uint32)

    prover = Prover(suite, circuit.taps)
    iop = prover.iop

    info = np.frombuffer(V.PROOF_SYSTEM_INFO.ljust(16, b"\0")[:16], np.uint8)
    iop.commit(suite.hash_elem_slice(F.encode_np(info.astype(np.uint32))))
    info = np.frombuffer(circuit.CIRCUIT_INFO.ljust(16, b"\0")[:16], np.uint8)
    iop.commit(suite.hash_elem_slice(F.encode_np(info.astype(np.uint32))))

    header = np.concatenate([global_m, np.array([po2], np.uint32)])
    iop.commit(suite.hash_elem_slice(header))
    iop.write_field_elems(header)
    prover.set_po2(po2)

    prover.commit_group(REGISTER_GROUP_CODE, jnp.asarray(code_m))
    prover.commit_group(REGISTER_GROUP_DATA, jnp.asarray(data_m))

    mix_m = np.array([iop.random_elem() for _ in range(REGCOUNT_MIX)],
                     np.uint32)
    prover.commit_group(REGISTER_GROUP_ACCUM, jnp.asarray(accum_m))

    if use_plan:
        hal_obj = _PlanHal(circuit)
    else:
        hal_obj = _KeccakHal(circuit)
    return prover.finalize([mix_m, global_m], hal_obj)


class _PlanHal:
    """Level-scheduled plan evaluator chunked over the domain (shares the
    ir_exec machinery with rv32im)."""

    _plan = None

    def __init__(self, circuit):
        self.circuit = circuit
        if _PlanHal._plan is None:
            from .. import ir_exec
            _PlanHal._plan = ir_exec.build_plan(circuit)

    def eval_check(self, groups, globals_list, poly_mix, po2):
        from .. import ir_exec
        plan = _PlanHal._plan
        mix_g, out_g = (np.asarray(g, np.uint32) for g in globals_list)
        accum, _code, data = (np.asarray(g) for g in groups)
        cycles = 1 << po2
        domain = cycles * 4

        pm_pows = self.circuit.mix_pows(poly_mix)

        gvals = np.array([(out_g if b == 2 else mix_g)[i]
                          for b, i in plan.global_specs], np.uint32)
        bufs = {0: accum, 1: data}
        chunk = 1 << 13
        tot = np.zeros((domain, 4), np.uint32)
        for start in range(0, domain, chunk):
            T = min(chunk, domain - start)
            tapm = ir_exec.build_tap_matrix_np(plan, bufs, start, T, domain)
            tot[start:start + T] = ir_exec.execute_plan_np(
                plan, tapm, gvals, pm_pows)

        w = F.s_encode(F.ROU_FWD[po2 + 2])
        kpow = F.s_pow(F.s_encode(3), cycles)
        wq = F.s_pow(w, cycles)
        ys, cw = [], F.R % F.P
        for _ in range(4):
            ys.append(F.s_inv(F.s_sub(F.s_mul(kpow, cw), F.R % F.P)))
            cw = F.s_mul(cw, wq)
        invz = np.tile(np.array(ys, np.uint32), domain // 4)
        return F.mul_np(tot, invz[:, None]).T
