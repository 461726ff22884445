"""Recursion circuit data tests: extraction integrity, PolyExtStep
interpreter, control-ID data."""

import os

import numpy as np
import pytest

from risc0_tpu import field as F
from risc0_tpu.circuit.recursion import load_circuit
from risc0_tpu.circuit.recursion.circuit import _load_ids
from risc0_tpu.verify.verifier import VerificationError


def test_tapset_structure():
    c = load_circuit()
    # reference taps.rs:4527-4531: 643 taps, 163 regs, 5 combos, 20 backs
    assert c.taps.tap_size == 643
    assert c.taps.reg_count == 163
    assert c.taps.combos_size == 5
    assert c.taps.tot_combo_backs == 20
    assert c.taps.group_size(1) == 23  # ctrl/code width (SURVEY appendix B)


def test_poly_ext_interpreter():
    c = load_circuit()
    rng = np.random.default_rng(3)
    pm = F.encode_np(rng.integers(0, F.P, 4, dtype=np.uint32))
    eval_u = F.encode_np(rng.integers(0, F.P, (c.taps.tap_size, 4),
                                      dtype=np.uint32))
    out = F.encode_np(rng.integers(0, F.P, 32, dtype=np.uint32))
    mix = F.encode_np(rng.integers(0, F.P, 20, dtype=np.uint32))
    r1 = c.poly_ext(pm, eval_u, out, mix)
    assert np.array_equal(r1, c.poly_ext(pm, eval_u, out, mix))
    out2 = out.copy()
    out2[0] = (int(out2[0]) + 1) % F.P
    assert not np.array_equal(r1, c.poly_ext(pm, eval_u, out2, mix))


def test_control_ids_extracted():
    ids = _load_ids()
    assert ids["ALLOWED_CONTROL_IDS"].shape == (27, 8)
    assert ids["POSEIDON2_CONTROL_IDS"].shape == (32, 8)
    assert ids["SHA256_CONTROL_IDS"].shape == (32, 8)
    assert ids["ALLOWED_CONTROL_ROOT"].shape == (8,)
    # spot-check against reference control_id.rs:54-56
    root = bytes(ids["ALLOWED_CONTROL_ROOT"].tobytes()).hex()
    assert root == ("3b304d1098ad401d3a04bc11976f476633a71b482b7851189663ca6"
                    "1209abe45")


def test_garbage_recursion_seal_rejected():
    from risc0_tpu.circuit.recursion import verify_recursion_seal

    rng = np.random.default_rng(2)
    bad = rng.integers(0, F.P, size=30_000, dtype=np.uint32)
    with pytest.raises(VerificationError):
        verify_recursion_seal(bad)


def test_keccak_lift_control_id_golden():
    """The released keccak_lift_14 program's control ID (code-group merkle
    root) must match the official KECCAK_CONTROL_IDS[po2=14] digest
    (reference keccak/src/control_id.rs)."""
    from risc0_tpu.circuit.recursion.prove import load_keccak_lift

    prog = load_keccak_lift(14)
    root = prog.control_id()
    want = np.frombuffer(bytes.fromhex(
        "92631f2b8dc9431cb2abdc1e82ac2e30deaf086a36e51e4aa60ad0516bf5b748"),
        np.uint32)
    assert np.array_equal(root, want)


def test_recursion_preflight_micro_ops():
    """Hand-built micro-op program: consts, add/mul, eq."""
    from risc0_tpu.circuit.recursion.preflight import RecursionPreflight
    from risc0_tpu.circuit.recursion.prove import RECURSION_CODE_SIZE

    def micro_row(wa, ops):
        row = [0] * RECURSION_CODE_SIZE
        row[0] = wa
        row[1] = 1  # select micro_ops
        for i, (op, a, b, c) in enumerate(ops):
            base = 8 + 4 * i
            row[base:base + 4] = [op, a, b, c]
        return row

    rows = [
        # consts 5 and 7 at wom[1], wom[2]; 0 at wom[3]
        micro_row(1, [(0, 5, 0, 0), (0, 7, 0, 0), (0, 0, 0, 0)]),
        # add -> wom[4], mul -> wom[5], sub -> wom[6]
        micro_row(4, [(1, 1, 2, 0), (3, 1, 2, 0), (2, 2, 1, 0)]),
        # eq checks: wom[4] vs const 12 (write first), nop consts
        micro_row(7, [(0, 12, 0, 0), (0, 35, 0, 0), (0, 2, 0, 0)]),
        micro_row(10, [(5, 4, 7, 0), (5, 5, 8, 0), (5, 6, 9, 0)]),
    ]
    pf = RecursionPreflight([])
    # wom[0] must exist for the argument (programs init it)
    pf.wom_write(0, (0, 0, 0, 0))
    pf.run(rows)
    assert pf.wom[4] == (12, 0, 0, 0)
    assert pf.wom[5] == (35, 0, 0, 0)
    assert pf.wom[6] == (2, 0, 0, 0)


def test_recursion_range_eval_check_matches_plan_oracle():
    """The device range-file eval_check for the recursion circuit must agree
    bit-exactly with the numpy level-plan oracle (which is conformance-tested
    against the scalar poly_ext evaluator)."""
    from risc0_tpu.circuit.recursion.circuit import load_prover_circuit
    from risc0_tpu.circuit.recursion.prove import _RecPlanHal, _RecRangeHal

    c = load_prover_circuit()
    po2 = 4
    domain = (1 << po2) * 4
    rng = np.random.default_rng(5)
    accum = rng.integers(0, F.P, (12, domain), dtype=np.uint32)
    code = rng.integers(0, F.P, (23, domain), dtype=np.uint32)
    data = rng.integers(0, F.P, (128, domain), dtype=np.uint32)
    mix_g = rng.integers(0, F.P, (20,), dtype=np.uint32)
    out_g = rng.integers(0, F.P, (32,), dtype=np.uint32)
    poly_mix = rng.integers(0, F.P, (4,), dtype=np.uint32)

    ref = _RecPlanHal(c).eval_check(
        [accum, code, data], [mix_g, out_g], poly_mix, po2)
    got = np.asarray(_RecRangeHal(c, chunk=32).eval_check(
        [accum, code, data], [mix_g, out_g], poly_mix, po2))
    assert np.array_equal(got, ref)


@pytest.mark.skipif(not os.environ.get("RISC0_TPU_SLOW_TESTS"),
                    reason="full recursion prove at po2=18 (slow on CPU)")
def test_recursion_prove_verify_succinct_receipt():
    """VERDICT r1 item 4: keccak seal -> recursion seal (prove_program over
    the released keccak_lift_14 zkr) -> verified SuccinctReceipt, including
    the recursion STARK verify, control-ID inclusion, and output claim
    digest decode (reference receipt/succinct.rs:103-190)."""
    from risc0_tpu.circuit.keccak import prove_keccak
    from risc0_tpu.circuit.keccak.verify import (keccak_digest_from_globals,
                                                 verify_keccak_seal)
    from risc0_tpu.circuit.recursion.prove import (load_keccak_lift,
                                                   prove_zkr)
    from risc0_tpu.zkvm.receipt import VerifierContext

    rng = np.random.default_rng(4)
    inputs = [[int(x) for x in rng.integers(0, 1 << 64, 25,
                                            dtype=np.uint64)]]
    seal = prove_keccak(inputs, 14)
    out = verify_keccak_seal(seal)
    claim = keccak_digest_from_globals(out, montgomery=True)
    inp = [0] * 8 + [int(x) for x in seal]
    for w in claim:
        inp.extend([int(w) & 0xFFFF, int(w) >> 16])
    inp.append(1 << 14)

    prog = load_keccak_lift(14)
    control_id = prog.control_id()
    receipt = prove_zkr(prog, control_id, [control_id], inp,
                        rng=np.random.default_rng(8))
    # the lift program echoes the inner control root it was given (zeros)
    ctx = VerifierContext(control_root=receipt.control_root,
                          inner_control_root=np.zeros(8, np.uint32))
    receipt.verify_integrity(ctx)

    # tamper: flip a seal word -> must fail
    from risc0_tpu.zkvm.receipt import VerificationError as RErr
    bad = receipt.seal.copy()
    bad[40] ^= 1
    import dataclasses
    broken = dataclasses.replace(receipt, seal=bad)
    with pytest.raises(RErr):
        broken.verify_integrity(ctx)


@pytest.mark.skipif(not os.environ.get("RISC0_TPU_SLOW_TESTS"),
                    reason="runs the full released lift program (~5 min)")
def test_official_keccak_lift_accepts_our_seal():
    """The released keccak_lift_14.zkr (a complete in-circuit STARK
    verifier) must execute against one of our keccak seals with zero
    assertion failures."""
    from risc0_tpu.circuit.keccak import prove_keccak
    from risc0_tpu.circuit.keccak.verify import (keccak_digest_from_globals,
                                                 verify_keccak_seal)
    from risc0_tpu.circuit.recursion.preflight import RecursionPreflight
    from risc0_tpu.circuit.recursion.prove import load_keccak_lift

    rng = np.random.default_rng(2)
    inputs = [[int(x) for x in rng.integers(0, 1 << 64, 25,
                                            dtype=np.uint64)]]
    seal = prove_keccak(inputs, 14)
    out = verify_keccak_seal(seal)
    claim = keccak_digest_from_globals(out, montgomery=True)
    inp = [0] * 8 + [int(x) for x in seal]
    for w in claim:
        inp.extend([int(w) & 0xFFFF, int(w) >> 16])
    inp.append(1 << 14)
    prog = load_keccak_lift(14)
    pf = RecursionPreflight(inp)
    pf.run(prog.code)  # raises on any EQ failure
