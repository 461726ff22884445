"""rv32im circuit data tests: extraction integrity + verifier wiring."""

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
