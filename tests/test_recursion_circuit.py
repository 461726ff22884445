"""Recursion circuit data tests: extraction integrity, PolyExtStep
interpreter, control-ID data."""

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
