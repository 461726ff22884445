"""Fused two-pass Pallas NTT (hal/pallas/ntt.py): bit-exact against the
per-stage jnp NTT (core/ntt.py) in interpreter mode on CPU."""

import numpy as np
import pytest

from risc0_tpu import field as F
from risc0_tpu.core import ntt
from risc0_tpu.hal.pallas import ntt as pntt


@pytest.mark.parametrize("batch,n_bits", [(8, 14), (16, 15), (1, 16)])
def test_evaluate_matches_jnp(rng, batch, n_bits):
    x = rng.integers(0, F.P, (batch, 1 << n_bits), dtype=np.uint32)
    want = np.asarray(ntt.evaluate_ntt(x))
    got = np.asarray(pntt.evaluate_ntt(x, interpret=True))
    assert np.array_equal(got, want)


def test_evaluate_with_expand_bits(rng):
    # the LDE path: expand 4x then skip the bottom 2 stages
    coeffs = rng.integers(0, F.P, (8, 1 << 13), dtype=np.uint32)
    expanded = np.asarray(ntt.expand(coeffs, 2))
    want = np.asarray(ntt.evaluate_ntt(expanded, 2))
    got = np.asarray(pntt.evaluate_ntt(expanded, 2, interpret=True))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("batch,n_bits", [(8, 14), (3, 15)])
def test_interpolate_matches_jnp(rng, batch, n_bits):
    x = rng.integers(0, F.P, (batch, 1 << n_bits), dtype=np.uint32)
    want = np.asarray(ntt.interpolate_ntt(x))
    got = np.asarray(pntt.interpolate_ntt(x, interpret=True))
    assert np.array_equal(got, want)


def test_roundtrip(rng):
    x = rng.integers(0, F.P, (8, 1 << 14), dtype=np.uint32)
    coeffs = pntt.interpolate_ntt(x, interpret=True)
    back = np.asarray(pntt.evaluate_ntt(np.asarray(coeffs),
                                        interpret=True))
    assert np.array_equal(back, x)


def test_small_sizes_fall_back(rng):
    x = rng.integers(0, F.P, (4, 1 << 8), dtype=np.uint32)
    assert np.array_equal(np.asarray(pntt.evaluate_ntt(x, interpret=True)),
                          np.asarray(ntt.evaluate_ntt(x)))
