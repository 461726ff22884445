"""rv32im circuit data tests: extraction integrity + verifier wiring."""

import os

import numpy as np
import pytest

from risc0_tpu import field as F
from risc0_tpu.circuit.rv32im import load_circuit
from risc0_tpu.circuit.rv32im.verify import verify_rv32im_seal
from risc0_tpu.verify.verifier import VerificationError


def test_taps_match_survey_constants():
    c = load_circuit()
    # SURVEY.md appendix B: accum=103, code=1, data=211 cols; 315 regs
    assert [c.taps.group_size(g) for g in range(3)] == [103, 1, 211]
    assert c.taps.reg_count == 315
    assert c.taps.tap_size == 790
    assert c.taps.combos_size == 4
    assert c.taps.tot_combo_backs == 14


def test_poly_ext_deterministic_and_sensitive():
    c = load_circuit()
    rng = np.random.default_rng(0)
    pm = F.encode_np(rng.integers(0, F.P, 4, dtype=np.uint32))
    eval_u = F.encode_np(rng.integers(0, F.P, (c.taps.tap_size, 4),
                                      dtype=np.uint32))
    out = F.encode_np(rng.integers(0, F.P, 90, dtype=np.uint32))
    mix = F.encode_np(rng.integers(0, F.P, 36, dtype=np.uint32))
    r1 = c.poly_ext(pm, eval_u, out, mix)
    assert np.array_equal(r1, c.poly_ext(pm, eval_u, out, mix))
    eval_u2 = eval_u.copy()
    eval_u2[500, 1] = (int(eval_u2[500, 1]) + 1) % F.P
    assert not np.array_equal(r1, c.poly_ext(pm, eval_u2, out, mix))
    out2 = out.copy()
    out2[10] = (int(out2[10]) + 1) % F.P
    assert not np.array_equal(r1, c.poly_ext(pm, eval_u, out2, mix))


def test_garbage_seal_rejected():
    with pytest.raises(VerificationError):
        verify_rv32im_seal(np.zeros(10, np.uint32))
    rng = np.random.default_rng(1)
    bad = rng.integers(0, F.P, size=50_000, dtype=np.uint32)
    bad[0] = 2  # correct version word
    with pytest.raises(VerificationError):
        verify_rv32im_seal(bad)


def test_eval_check_matches_poly_ext():
    """The vectorized domain evaluator and the scalar DEEP-point evaluator
    run the same IR through different code paths; their values must agree
    at every domain row (conformance oracle for the prover-side path)."""
    c = load_circuit()
    rng = np.random.default_rng(7)
    po2 = 4
    cycles = 1 << po2
    domain = cycles * 4
    accum = F.encode_np(rng.integers(0, F.P, (103, domain), dtype=np.uint32))
    code = F.encode_np(rng.integers(0, F.P, (1, domain), dtype=np.uint32))
    data = F.encode_np(rng.integers(0, F.P, (211, domain), dtype=np.uint32))
    out = F.encode_np(rng.integers(0, F.P, 90, dtype=np.uint32))
    mix = F.encode_np(rng.integers(0, F.P, 36, dtype=np.uint32))
    pm = F.encode_np(rng.integers(0, F.P, 4, dtype=np.uint32))
    check = c.eval_check_np([accum, code, data], [mix, out], pm, po2)
    w = F.s_encode(F.ROU_FWD[po2 + 2])
    for i in (0, 17, 63):
        eval_u = np.zeros((c.taps.tap_size, 4), np.uint32)
        for (g, col, back), ti in c._tap_index.items():
            buf = {0: accum, 1: code, 2: data}[g]
            eval_u[ti, 0] = buf[col][(i - 4 * back) % domain]
        tot = c.poly_ext(pm, eval_u, out, mix)
        y = F.s_pow(F.s_mul(F.s_encode(3), F.s_pow(w, i)), cycles)
        invz = F.s_inv(F.s_sub(y, F.R % F.P))
        assert np.array_equal(check[:, i], F.mul_np(tot, np.uint32(invz)))


def test_ir_plan_matches_reference_evaluator():
    """The level-scheduled register-allocated plan must agree with the
    straight-line numpy evaluator (and transitively with poly_ext)."""
    from risc0_tpu.circuit import ir_exec

    c = load_circuit()
    plan = ir_exec.build_plan(c)
    assert len(plan.levels) < 1000
    rng = np.random.default_rng(11)
    po2 = 4
    domain = (1 << po2) * 4
    accum = F.encode_np(rng.integers(0, F.P, (103, domain), dtype=np.uint32))
    code = F.encode_np(rng.integers(0, F.P, (1, domain), dtype=np.uint32))
    data = F.encode_np(rng.integers(0, F.P, (211, domain), dtype=np.uint32))
    out = F.encode_np(rng.integers(0, F.P, 90, dtype=np.uint32))
    mix = F.encode_np(rng.integers(0, F.P, 36, dtype=np.uint32))
    pm = F.encode_np(rng.integers(0, F.P, 4, dtype=np.uint32))
    ref = c.eval_check_np([accum, code, data], [mix, out], pm, po2)

    pm_pows = c.mix_pows(pm)
    gvals = np.array([(out if b == 2 else mix)[i]
                      for b, i in plan.global_specs], np.uint32)
    tapm = ir_exec.build_tap_matrix_np(plan, {0: accum, 1: data}, 0, domain,
                                       domain)
    tot = ir_exec.execute_plan_np(plan, tapm, gvals, pm_pows)
    w = F.s_encode(F.ROU_FWD[po2 + 2])
    kpow = F.s_pow(F.s_encode(3), 1 << po2)
    wq = F.s_pow(w, 1 << po2)
    ys, cw = [], F.R % F.P
    for _ in range(4):
        ys.append(F.s_inv(F.s_sub(F.s_mul(kpow, cw), F.R % F.P)))
        cw = F.s_mul(cw, wq)
    invz = np.tile(np.array(ys, np.uint32), domain // 4)
    got = F.mul_np(tot, invz[:, None]).T
    assert np.array_equal(got, ref)


def test_claim_decode_roundtrip():
    from risc0_tpu.circuit.layout import rv32im_global_layout
    from risc0_tpu.circuit.rv32im.claim import OUTPUT_SIZE, decode_claim

    rng = np.random.default_rng(5)
    lay = rv32im_global_layout()
    g = np.zeros(OUTPUT_SIZE, np.uint64)

    def put_digest(node, words):
        for pair, w in zip(node.values, words):
            g[pair.low.offset] = int(w) & 0xFFFF
            g[pair.high.offset] = int(w) >> 16

    pre = rng.integers(0, 2**32, 8, dtype=np.uint32)
    post = rng.integers(0, 2**32, 8, dtype=np.uint32)
    inp = rng.integers(0, 2**32, 8, dtype=np.uint32)
    out = rng.integers(0, 2**32, 8, dtype=np.uint32)
    put_digest(lay.state_in, pre)
    put_digest(lay.state_out, post)
    put_digest(lay.input, inp)
    put_digest(lay.output, out)
    g[lay.is_terminate.offset] = 1
    g[lay.term_a0high.offset] = 3
    g[lay.term_a0low.offset] = 0
    seal = np.concatenate([[2], F.encode_np(g.astype(np.uint32))]).astype(
        np.uint32)
    claim = decode_claim(seal)
    assert claim.exit_code.kind == "Halted" and claim.exit_code.user_exit == 3
    assert np.array_equal(claim.pre.value.merkle_root, pre)
    # Halted -> post state pruned to zero (reference claim/receipt.rs:168-171)
    assert np.array_equal(claim.post.value.merkle_root, np.zeros(8, np.uint32))
    assert np.array_equal(claim.input.digest(), inp)
    assert np.array_equal(claim.output.digest(), out)


def _loop_segment(po2=16, count=100):
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

    elf = open("/root/repo/guests/loop.bin", "rb").read()
    env = ExecutorEnv(segment_po2=po2).write_slice(
        count.to_bytes(4, "little"))
    return ExecutorImpl(env, elf).run().segments[0]


def test_witgen_real_segment():
    """witgen on a real executed segment: the ~300 generated EQZ assertions
    and write-once consistency checks all run inside; accum permutation/
    lookup totals must cancel to zero."""
    from risc0_tpu.circuit.rv32im.witgen import witgen_accum, witgen_exec

    seg = _loop_segment()
    rng = np.random.default_rng(3)
    rand_z = tuple(int(x) for x in rng.integers(0, F.P, 4))
    res = witgen_exec(seg, rand_z=rand_z)
    assert res["rows"] == 1 << 14
    assert res["data"].shape == (211, res["rows"])
    mix = rng.integers(0, F.P, 36).astype(np.uint32)
    acc = witgen_accum(res, mix)
    assert acc.shape == (103, res["rows"])
    # grand totals of the running-sum columns cancel on a valid trace
    assert (acc[-4:, -1] == 0).all()


def test_witgen_povw_nonce_real_segment():
    """A segment executed under a PoVW job id carries its nonce through the
    LoadRootAndNonce preflight reads and the povw_nonce globals; the EQZ +
    write-once witgen checks must accept the nonzero-nonce witness
    (reference witgen/mod.rs:309-324, preflight.rs:580-587)."""
    from risc0_tpu.circuit.rv32im.witgen import _programs, witgen_exec
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl
    from risc0_tpu.zkvm.povw import PovwJobId

    job = PovwJobId(log=0xABCDEF0123456789ABCDEF0123456789ABCDEF01,
                    job=0x1122334455667788)
    elf = open("/root/repo/guests/loop.bin", "rb").read()
    env = ExecutorEnv(segment_po2=16, povw_job_id=job).write_slice(
        (100).to_bytes(4, "little"))
    seg = ExecutorImpl(env, elf).run().segments[0]
    assert seg.povw_nonce == job.nonce(0)

    res = witgen_exec(seg, rand_z=(5, 6, 7, 8))
    gm = _programs()["meta"]["global"]
    halfs = []
    for lo, hi in gm["povw_nonce"]:
        halfs += [int(res["global"][lo]), int(res["global"][hi])]
    assert halfs == [int(h) for h in job.nonce(0).to_u16s()]


def test_witgen_rejects_corrupt_txn():
    from risc0_tpu.circuit.rv32im.witgen import witgen_exec
    from risc0_tpu.zkvm.exec import preflight_segment

    seg = _loop_segment()
    pf = preflight_segment(seg)
    pf["txns"][4000, 2] ^= 1
    with pytest.raises(RuntimeError):
        witgen_exec(seg, pf=pf, n_threads=1)


@pytest.mark.skipif(not os.environ.get("RISC0_TPU_SLOW_TESTS"),
                    reason="~12min on CPU (numpy eval_check)")
def test_prove_verify_real_segment():
    """Full e2e: execute -> witgen -> STARK prove -> verify."""
    from risc0_tpu.circuit.rv32im.prove import prove_segment
    from risc0_tpu.circuit.rv32im.verify import verify_rv32im_seal

    seg = _loop_segment()
    seal = prove_segment(seg, use_jit=False,
                         rng=np.random.default_rng(1))
    out = verify_rv32im_seal(seal)
    assert len(out) == 90


def test_range_eval_check_matches_plan_oracle():
    """The device range-file executor (ir_range) must agree bit-exactly with
    the numpy level-plan oracle (ir_exec) — which is itself checked against
    the scalar poly_ext evaluator above."""
    from risc0_tpu.circuit import ir_exec, ir_range

    c = load_circuit()
    po2 = 4
    cycles = 1 << po2
    domain = cycles * 4
    rng = np.random.default_rng(11)
    accum = rng.integers(0, F.P, (103, domain), dtype=np.uint32)
    data = rng.integers(0, F.P, (211, domain), dtype=np.uint32)
    mix_g = rng.integers(0, F.P, (36,), dtype=np.uint32)
    out_g = rng.integers(0, F.P, (90,), dtype=np.uint32)
    poly_mix = rng.integers(0, F.P, (4,), dtype=np.uint32)
    pm = c.mix_pows(poly_mix)

    plan = ir_exec.build_plan(c)
    gv = np.array([(out_g if b == 2 else mix_g)[i]
                   for b, i in plan.global_specs], np.uint32)
    bufs = {0: accum, 1: data}
    T = 32
    tot = np.zeros((domain, 4), np.uint32)
    for start in range(0, domain, T):
        tapm = ir_exec.build_tap_matrix_np(plan, bufs, start, T, domain)
        tot[start:start + T] = ir_exec.execute_plan_np(plan, tapm, gv, pm)
    w = F.s_encode(F.ROU_FWD[po2 + 2])
    kpow = F.s_pow(F.s_encode(3), cycles)
    wq = F.s_pow(w, cycles)
    ys, cw = [], F.R % F.P
    for _ in range(4):
        ys.append(F.s_inv(F.s_sub(F.s_mul(kpow, cw), F.R % F.P)))
        cw = F.s_mul(cw, wq)
    invz = np.tile(np.array(ys, np.uint32), domain // 4)
    expected = F.mul_np(tot, invz[:, None]).T

    rp = ir_range.build_range_plan(c)
    gv_r = np.array([(out_g if b == 2 else mix_g)[i]
                     for b, i in rp.global_specs], np.uint32)
    fn = ir_range.make_eval_check(c, po2, chunk=T)
    assert ir_range.plan_buf_ids(rp) == [0, 1]
    got = np.asarray(fn((accum, data), gv_r, pm))
    assert np.array_equal(got, expected)


@pytest.mark.skipif(not os.environ.get("RISC0_TPU_SLOW_TESTS"),
                    reason="full prove of a SHA-accelerator segment")
def test_prove_verify_sha_accelerator_segment():
    """e2e over a guest that drives the SHA-256 accelerator ecall: the
    witgen sha back-state records word addresses (csrc/r0vm.cpp sha_step;
    reference execute/sha2.rs WordAddr fields) — this segment was
    unprovable before round 5."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent /
                           "examples"))
    from sha import build_guest

    from risc0_tpu.circuit.rv32im.prove import prove_segment
    from risc0_tpu.circuit.rv32im.verify import verify_rv32im_seal
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

    msg = b"sha accelerator proving vector " * 2
    elf = build_guest(len(msg))
    env = ExecutorEnv(segment_po2=16).write_slice(msg)
    seg = ExecutorImpl(env, elf).run().segments[0]
    seal = prove_segment(seg, rng=np.random.default_rng(2))
    out = verify_rv32im_seal(seal)
    assert len(out) == 90
