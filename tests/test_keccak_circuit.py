"""Keccak accelerator circuit tests: preflight structure, witgen oracles,
digest binding, and (env-gated) full prove/verify."""

import os

import numpy as np
import pytest

from risc0_tpu import field as F


def _inputs(n, seed=5):
    rng = np.random.default_rng(seed)
    return [[int(x) for x in rng.integers(0, 1 << 64, 25, dtype=np.uint64)]
            for _ in range(n)]


def test_preflight_structure():
    from risc0_tpu.circuit.keccak.preflight import KeccakPreflight

    pf = KeccakPreflight(_inputs(2), 1 << 14)
    # 1 init + 2 * (1 read + 36 shaIn + 2 expand + 120 keccak + 1 write +
    # 36 shaOut) + shutdown padding
    assert pf.cycle == 1 << 14
    assert len(pf.cur_preimage) == 1 << 14
    assert pf.cur_preimage[-1] == 2  # shutdown rows point past the end


def test_witgen_digest_matches_external_sha():
    """The circuit-computed transcript digest must equal a conventional
    SHA-256 over the in/out keccak states (reference keccak/src/lib.rs
    compute_keccak_digest)."""
    from risc0_tpu.circuit.keccak.preflight import keccak_f
    from risc0_tpu.circuit.keccak.witgen import witgen_keccak
    from risc0_tpu.circuit.keccak.verify import keccak_digest_from_globals
    from risc0_tpu.hash import sha256

    inputs = _inputs(3)
    res = witgen_keccak(inputs, 14)
    got = keccak_digest_from_globals(res["global"])

    # conventional transcript: for each state, input words then the
    # permuted output words, as little-endian u32 pairs
    words = []
    for st in inputs:
        for x in st:
            words += [x & 0xFFFFFFFF, (x >> 32) & 0xFFFFFFFF]
        words += [0] * 14
        out = keccak_f(st)
        for x in out:
            words += [x & 0xFFFFFFFF, (x >> 32) & 0xFFFFFFFF]
        words += [0] * 14
    state = list(sha256.SHA256_INIT) if hasattr(sha256, "SHA256_INIT") else \
        [0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
         0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19]
    from risc0_tpu.circuit.keccak.preflight import compute_sha_infos
    for i in range(0, len(words), 16):
        compute_sha_infos(state, words[i:i + 16])
    assert [int(w) for w in got] == state


def test_witgen_constraints_vanish_small():
    from risc0_tpu.circuit.keccak.circuit import load_circuit
    from risc0_tpu.circuit.keccak.witgen import (REGCOUNT_ACCUM,
                                                 witgen_keccak)

    rng = np.random.default_rng(7)
    inputs = _inputs(1, seed=7)
    res = witgen_keccak(inputs, 14)
    rows = res["rows"]
    accum_m = np.zeros((REGCOUNT_ACCUM, rows), np.uint32)
    code_m = np.zeros((1, rows), np.uint32)
    data_m = F.encode_np(res["data"])
    out_g = F.encode_np(res["global"])
    mix_g = F.encode_np(rng.integers(0, F.P, 4).astype(np.uint32))
    pm = F.encode_np(rng.integers(0, F.P, 4).astype(np.uint32))
    c = load_circuit()
    # spot-check a window of rows via the plan evaluator to keep it fast
    from risc0_tpu.circuit import ir_exec
    plan = ir_exec.build_plan(c)
    gvals = np.array([(out_g if b == 2 else mix_g)[i]
                      for b, i in plan.global_specs], np.uint32)
    pm_pows = c.mix_pows(pm)
    # trace-domain check: override the 4x stride with direct row taps
    tapm = np.zeros((len(plan.tap_specs), 512), np.uint32)
    bufs = {0: accum_m, 1: data_m}
    for i, (buf, col, back) in enumerate(plan.tap_specs):
        rows_idx = (np.arange(0, 512) - back) % rows
        tapm[i] = bufs[buf][col][rows_idx]
    tot = ir_exec.execute_plan_np(plan, tapm, gvals, pm_pows)
    assert int((tot != 0).sum()) == 0


@pytest.mark.skipif(not os.environ.get("RISC0_TPU_SLOW_TESTS"),
                    reason="several minutes on CPU")
def test_prove_verify_keccak():
    from risc0_tpu.circuit.keccak import prove_keccak, verify_keccak_seal

    seal = prove_keccak(_inputs(2), 14)
    out = verify_keccak_seal(seal)
    assert len(out) == 17


def test_compute_keccak_digest_matches_witgen_globals():
    """Host-side compute_keccak_digest (reference keccak/src/lib.rs:49-92)
    predicts exactly the claim digest the circuit witgen commits in its
    globals — this is the claim the guest-side batcher assumes per
    KECCAK_PROVE flush."""
    from risc0_tpu.circuit.keccak import compute_keccak_digest
    from risc0_tpu.circuit.keccak.verify import keccak_digest_from_globals
    from risc0_tpu.circuit.keccak.witgen import witgen_keccak

    inputs = _inputs(2, seed=11)
    res = witgen_keccak(inputs, 14)
    assert np.array_equal(compute_keccak_digest(inputs),
                          keccak_digest_from_globals(res["global"]))
