"""Recursion circuit prover: run a recursion program (zkr) and seal it.

Mirrors the reference driver (risc0/circuit/recursion/src/prove/mod.rs:
160-252 prove + witgen.rs): preflight the program, generate the witness
(step_exec + WOM argument sort/inject/verify via csrc/witgen.cpp), add zk
noise, then the standard seal flow (info commits, globals||po2 header,
ctrl/data commits, mix, plonk accum, finalize).
"""

from __future__ import annotations

import ctypes as C
import json
import lzma
import os
import struct

import numpy as np

from ... import field as F
from ...hash.suite import POSEIDON2
from ...prove.prover import Prover
from ...taps import (REGISTER_GROUP_ACCUM, REGISTER_GROUP_CODE,
                     REGISTER_GROUP_DATA)
from ...verify import verifier as V
from ...zkvm import native
from .circuit import load_prover_circuit
from .preflight import RecursionPreflight

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

RECURSION_CODE_SIZE = 23   # reference prove/mod.rs:55
RECURSION_PO2 = 18         # reference keccak/src/lib.rs:31
ZK_CYCLES = 1024
REGCOUNT_DATA = 128
REGCOUNT_ACCUM = 12
INVALID = np.uint32(0xFFFFFFFF)

# Vendored copies of the released keccak_lift zkr programs (the reference
# ships them as data too: risc0/circuit/keccak/src/prove/*.zkr.xz).
_KECCAK_ZKR_DIR = os.path.join(os.path.dirname(__file__), "data", "zkr")


class Program:
    """A recursion program: raw code rows (reference prove/program.rs)."""

    def __init__(self, encoded, po2):
        encoded = np.asarray(encoded, np.uint32)
        assert len(encoded) % RECURSION_CODE_SIZE == 0
        self.code = encoded.reshape(-1, RECURSION_CODE_SIZE)
        self.po2 = po2
        assert len(self.code) <= (1 << po2) - ZK_CYCLES

    @property
    def code_rows(self):
        return len(self.code)

    def ctrl_buffer(self):
        """Column-major (23, 2^po2) code group, zero padded."""
        cycles = 1 << self.po2
        buf = np.zeros((RECURSION_CODE_SIZE, cycles), np.uint32)
        buf[:, :self.code_rows] = self.code.T
        return buf

    def control_id(self, suite_name="poseidon2"):
        import jax.numpy as jnp

        from ...hal import jnp_hal as hal
        from ...prove.prover import PolyGroup

        enc = F.encode_np(self.ctrl_buffer() % F.P)
        pg = PolyGroup(hal.make_coeffs(jnp.asarray(enc)),
                       suite_name=suite_name)
        return np.asarray(pg.merkle.root)


def load_keccak_lift(po2):
    """Load the released keccak_lift recursion program for a keccak po2."""
    path = os.path.join(_KECCAK_ZKR_DIR, f"keccak_lift_{po2}.zkr.xz")
    raw = lzma.open(path).read()
    return Program(np.frombuffer(raw, np.uint32), RECURSION_PO2)


def _load_prog_bin(name):
    with open(os.path.join(_DATA_DIR, name), "rb") as f:
        magic, n_ops, n_slots, n_ext, _ = struct.unpack("<4sIIII",
                                                        f.read(20))
        assert magic == b"WGN1"
        ops = np.frombuffer(f.read(n_ops * 20), np.uint32).reshape(n_ops, 5)
    return np.ascontiguousarray(ops), n_slots


_cache = {}


def _progs():
    if not _cache:
        for k, fname in (("exec", "rec_step_exec.bin"),
                         ("vmem", "rec_step_verify_mem.bin"),
                         ("comp", "rec_step_compute_accum.bin"),
                         ("ver", "rec_step_verify_accum.bin")):
            _cache[k] = _load_prog_bin(fname)
        with open(os.path.join(_DATA_DIR, "rec_witgen_meta.json")) as f:
            _cache["meta"] = json.load(f)
        lib = native.lib()
        U32P = C.POINTER(C.c_uint32)
        lib.r0_rec_witgen.restype = C.c_int
        lib.r0_rec_witgen.argtypes = [
            U32P, C.c_uint64, C.c_uint32, U32P, C.c_uint64, C.c_uint32,
            U32P, C.c_uint32, U32P, C.c_uint32,
            U32P, U32P, C.c_uint32,
            U32P, U32P, U32P, C.c_uint64, C.c_uint32]
        lib.r0_rec_accum.restype = C.c_int
        lib.r0_rec_accum.argtypes = [
            U32P, C.c_uint64, C.c_uint32, U32P, C.c_uint64, C.c_uint32,
            U32P, U32P, C.c_uint32,
            U32P, U32P, U32P, U32P, U32P, C.c_uint64, C.c_uint32]
        lib.r0_witgen_error.restype = C.c_char_p
        _cache["lib"] = lib
    return _cache


def _u32p(a):
    return a.ctypes.data_as(C.POINTER(C.c_uint32))


def witgen_recursion(program: Program, pf: RecursionPreflight,
                     n_threads=0, rng=None):
    """Generate ctrl/data/global witness buffers (standard form)."""
    progs = _progs()
    lib = progs["lib"]
    rng = rng or np.random.default_rng()
    steps = 1 << program.po2
    work = program.code_rows
    assert len(pf.cycles) == work

    ctrl = np.ascontiguousarray(program.ctrl_buffer())
    data = np.full((REGCOUNT_DATA, steps), INVALID, np.uint32)
    glob = np.full(32, INVALID, np.uint32)

    wom = np.array([list(w) for w in pf.wom], np.uint32).reshape(-1, 4) \
        if pf.wom else np.zeros((1, 4), np.uint32)
    iops = np.array([list(w) for w in pf.iops], np.uint32).reshape(-1, 4) \
        if pf.iops else np.zeros((1, 4), np.uint32)
    iop_idx = np.array([c[0] for c in pf.cycles], np.uint32)
    par_safe = np.array([c[1] for c in pf.cycles], np.uint32)

    ex_ops, ex_slots = progs["exec"]
    vm_ops, vm_slots = progs["vmem"]
    rc = lib.r0_rec_witgen(
        _u32p(ex_ops), len(ex_ops), ex_slots,
        _u32p(vm_ops), len(vm_ops), vm_slots,
        _u32p(wom), len(wom), _u32p(iops), len(iops),
        _u32p(iop_idx), _u32p(par_safe), work,
        _u32p(ctrl), _u32p(glob), _u32p(data), steps, n_threads)
    if rc != 0:
        raise RuntimeError(_loc(lib.r0_witgen_error().decode(),
                                progs["meta"]))
    # zk noise rows then zeroize (reference witgen.rs:96-121)
    data[:, steps - ZK_CYCLES:] = rng.integers(
        0, F.P, (REGCOUNT_DATA, ZK_CYCLES), dtype=np.uint32)
    data[data == INVALID] = 0
    glob[glob == INVALID] = 0
    return {"ctrl": ctrl, "data": data, "global": glob, "steps": steps,
        "work": work, "iop_idx": iop_idx, "par_safe": par_safe}


def accum_recursion(res, mix_std, n_threads=0, rng=None):
    progs = _progs()
    lib = progs["lib"]
    rng = rng or np.random.default_rng()
    steps = res["steps"]
    accum = np.full((REGCOUNT_ACCUM, steps), INVALID, np.uint32)
    accum[:, steps - ZK_CYCLES:] = rng.integers(
        0, F.P, (REGCOUNT_ACCUM, ZK_CYCLES), dtype=np.uint32)
    mix = np.ascontiguousarray(np.asarray(mix_std, np.uint32))
    cp_ops, cp_slots = progs["comp"]
    vr_ops, vr_slots = progs["ver"]
    rc = lib.r0_rec_accum(
        _u32p(cp_ops), len(cp_ops), cp_slots,
        _u32p(vr_ops), len(vr_ops), vr_slots,
        _u32p(res["iop_idx"]), _u32p(res["par_safe"]), res["work"],
        _u32p(res["ctrl"]), _u32p(res["global"]), _u32p(res["data"]),
        _u32p(mix), _u32p(accum), steps, n_threads)
    if rc != 0:
        raise RuntimeError(_loc(lib.r0_witgen_error().decode(),
                                progs["meta"]))
    accum[accum == INVALID] = 0
    return accum


def _loc(msg, meta):
    import re
    m = re.search(r"loc (\d+)", msg)
    if m:
        for fn in ("step_exec", "step_verify_mem", "step_compute_accum",
                   "step_verify_accum"):
            locs = meta.get(fn, {}).get("locs", [])
            if int(m.group(1)) < len(locs):
                msg += " [" + locs[int(m.group(1))] + "?]"
                break
    return msg


class _RecRangeHal:
    """Device eval_check for the recursion circuit via the range-file
    executor (circuit/ir_range.py): whole 4x domain in one jitted dispatch.
    Conformance: tests/test_recursion_circuit.py checks it against the numpy
    plan oracle (_RecPlanHal)."""

    _fns = {}   # po2 -> jitted runner
    _plan = None

    def __init__(self, circuit, chunk=1 << 13):
        self.circuit = circuit
        self.chunk = chunk
        if _RecRangeHal._plan is None:
            from .. import ir_range
            _RecRangeHal._plan = ir_range.build_range_plan(circuit)
            circuit.range_plan = _RecRangeHal._plan

    def eval_check(self, groups, globals_list, poly_mix, po2):
        import jax.numpy as jnp

        from .. import ir_range

        plan = _RecRangeHal._plan
        self.circuit.range_plan = plan
        fn = _RecRangeHal._fns.get(po2)
        if fn is None:
            fn = ir_range.make_eval_check(self.circuit, po2, chunk=self.chunk)
            _RecRangeHal._fns[po2] = fn
        mix_g, out_g = (np.asarray(g, np.uint32) for g in globals_list)
        accum, code, data = groups
        bufmap = {0: accum, 1: data, 4: code}
        evs = tuple(jnp.asarray(bufmap[b])
                    for b in ir_range.plan_buf_ids(plan))
        gvals = jnp.asarray(np.array(
            [(out_g if b == 2 else mix_g)[i] for b, i in plan.global_specs],
            np.uint32))
        pm_pows = jnp.asarray(self.circuit.mix_pows(poly_mix))
        return fn(evs, gvals, pm_pows)


class _RecPlanHal:
    """Plan-based eval_check for the recursion circuit (shares ir_exec)."""

    _plan = None

    def __init__(self, circuit):
        self.circuit = circuit
        if _RecPlanHal._plan is None:
            from .. import ir_exec
            _RecPlanHal._plan = ir_exec.build_plan(circuit)

    def eval_check(self, groups, globals_list, poly_mix, po2):
        from .. import ir_exec
        plan = _RecPlanHal._plan
        mix_g, out_g = (np.asarray(g, np.uint32) for g in globals_list)
        accum, code, data = (np.asarray(g) for g in groups)
        cycles = 1 << po2
        domain = cycles * 4

        pm_pows = self.circuit.mix_pows(poly_mix)

        gvals = np.array([(out_g if b == 2 else mix_g)[i]
                          for b, i in plan.global_specs], np.uint32)
        bufs = {0: accum, 1: data, 4: code}
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


def prove_program(program: Program, input_words, suite=None, rng=None,
                  n_threads=0, use_jit=True):
    """Run + prove a recursion program; returns (seal, output words)."""
    import jax.numpy as jnp

    suite = suite or POSEIDON2
    rng = rng or np.random.default_rng()
    circuit = load_prover_circuit()

    pf = RecursionPreflight(input_words)
    pf.run(program.code)

    res = witgen_recursion(program, pf, n_threads=n_threads, rng=rng)
    steps = res["steps"]

    ctrl_m = F.encode_np(res["ctrl"])
    data_m = F.encode_np(res["data"])
    global_m = F.encode_np(res["global"])

    prover = Prover(suite, circuit.taps)
    iop = prover.iop
    info = np.frombuffer(V.PROOF_SYSTEM_INFO.ljust(16, b"\0")[:16], np.uint8)
    iop.commit(suite.hash_elem_slice(F.encode_np(info.astype(np.uint32))))
    info = np.frombuffer(circuit.CIRCUIT_INFO.ljust(16, b"\0")[:16], np.uint8)
    iop.commit(suite.hash_elem_slice(F.encode_np(info.astype(np.uint32))))

    header = np.concatenate([global_m, np.array([program.po2], np.uint32)])
    iop.commit(suite.hash_elem_slice(header))
    iop.write_field_elems(header)
    prover.set_po2(program.po2)

    prover.commit_group(REGISTER_GROUP_CODE, jnp.asarray(ctrl_m))
    prover.commit_group(REGISTER_GROUP_DATA, jnp.asarray(data_m))

    mix_m = np.array([iop.random_elem() for _ in range(circuit.MIX_SIZE)],
                     np.uint32)
    accum = accum_recursion(res, F.decode_np(mix_m), n_threads=n_threads,
                            rng=rng)
    prover.commit_group(REGISTER_GROUP_ACCUM,
                        jnp.asarray(F.encode_np(accum)))

    hal_obj = _RecRangeHal(circuit) if use_jit else _RecPlanHal(circuit)
    seal = prover.finalize([mix_m, global_m], hal_obj)
    return seal, list(pf.output)


# ---------------------------------------------------------------------------
# Succinct receipts (reference zkvm/src/receipt/merkle.rs + host/recursion/
# prove/mod.rs:393-440 prove_zkr)
# ---------------------------------------------------------------------------

ALLOWED_CODE_MERKLE_DEPTH = 8  # reference receipt/merkle.rs:30


class MerkleGroup:
    """Fixed-depth Merkle set of allowed recursion control IDs."""

    def __init__(self, leaves):
        assert len(leaves) < (1 << ALLOWED_CODE_MERKLE_DEPTH)
        self.depth = ALLOWED_CODE_MERKLE_DEPTH
        self.leaves = [np.asarray(d, np.uint32) for d in leaves]

    def _leaf(self, i):
        return self.leaves[i] if i < len(self.leaves) \
            else np.zeros(8, np.uint32)

    def calc_root(self, suite=None):
        suite = suite or POSEIDON2

        def rng_root(start, end):
            if start + 1 == end:
                return self._leaf(start)
            mid = (start + end) // 2
            return suite.hash_pair(rng_root(start, mid), rng_root(mid, end))
        return rng_root(0, 1 << self.depth)

    def get_proof(self, control_id, suite=None):
        suite = suite or POSEIDON2
        idx = next(i for i, l in enumerate(self.leaves)
                   if np.array_equal(l, np.asarray(control_id, np.uint32)))
        digests = []
        lo, hi, pos = 0, 1 << self.depth, idx

        def rng_root(start, end):
            if start + 1 == end:
                return self._leaf(start)
            mid = (start + end) // 2
            return suite.hash_pair(rng_root(start, mid), rng_root(mid, end))
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if pos < mid:
                digests.append(rng_root(mid, hi))
                hi = mid
            else:
                digests.append(rng_root(lo, mid))
                lo = mid
        digests.reverse()  # sibling path leaf -> root
        return {"index": idx, "digests": digests}


def read_sha_halfs(shorts):
    """16 shorts -> 8 digest words (reference binfmt read_sha_halfs)."""
    shorts = [int(x) for x in shorts]
    return np.array([shorts[2 * i] | (shorts[2 * i + 1] << 16)
                     for i in range(8)], np.uint32)


def prove_zkr(program: Program, control_id, allowed_control_ids,
              input_words, claim=None, suite=None, **kw):
    """Prove a recursion program and wrap as a SuccinctReceipt
    (reference host/recursion/prove/mod.rs:393-440).  `claim` defaults to the
    pruned claim digest decoded from the seal output.  `suite` selects the
    outer proof's hash suite ("poseidon254" for the BN254 wrap); the
    control-ID MerkleGroup hashes with the same suite."""
    from ...zkvm.claims import MaybePruned
    from ...zkvm.receipt import SuccinctReceipt

    suite = suite or POSEIDON2
    seal, _output = prove_program(program, input_words, suite=suite, **kw)
    seal_vals = F.decode_np(np.asarray(seal[:32], np.uint32))
    claim_digest = read_sha_halfs(seal_vals[16:32])
    if claim is None:
        claim = MaybePruned.from_digest(claim_digest)
    group = MerkleGroup(allowed_control_ids)
    return SuccinctReceipt(
        seal=np.asarray(seal, np.uint32),
        control_id=np.asarray(control_id, np.uint32),
        claim=claim,
        control_root=group.calc_root(suite),
        control_inclusion_proof=group.get_proof(control_id, suite),
        hashfn=suite.name,
    )
