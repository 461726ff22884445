"""NTT conformance: round-trips, polynomial-evaluation semantics, expansion."""

import numpy as np
import jax.numpy as jnp

from risc0_tpu import field as F
from risc0_tpu.core import ntt


def poly_eval_naive(coeffs_std, x_std):
    """Evaluate sum c_i x^i over standard-form ints."""
    acc, cur = 0, 1
    for c in coeffs_std:
        acc = (acc + int(c) * cur) % F.P
        cur = (cur * x_std) % F.P
    return acc


def test_roundtrip(rng):
    for n_bits in (3, 6, 10):
        n = 1 << n_bits
        x = rng.integers(0, F.P, size=(4, n), dtype=np.uint32)
        coeffs = ntt.interpolate_ntt(jnp.asarray(x))
        back = ntt.evaluate_ntt(coeffs)
        assert np.array_equal(np.asarray(back), x)


def test_evaluate_matches_naive_poly_eval(rng):
    n_bits = 5
    n = 1 << n_bits
    coeffs_std = rng.integers(0, F.P, size=n, dtype=np.uint32)
    # bit-reverse coefficients, encode, run device NTT
    perm = ntt._bitrev_perm(n_bits)
    br_coeffs = F.encode_np(coeffs_std)[perm]
    evals = np.asarray(ntt.evaluate_ntt(jnp.asarray(br_coeffs[None, :])))[0]
    w = F.ROU_FWD[n_bits]
    for i in (0, 1, 7, n - 1):
        x = pow(w, i, F.P)
        assert F.decode_np(evals[i : i + 1])[0] == poly_eval_naive(coeffs_std, x)


def test_expand_evaluate(rng):
    # evaluating the expanded (4x domain) poly agrees with evaluating
    # the base poly at the 4n-th roots (reference ntt.rs test `expand`)
    n_bits, eb = 6, 2
    n = 1 << n_bits
    evals = rng.integers(0, F.P, size=(1, n), dtype=np.uint32)
    coeffs = np.asarray(ntt.interpolate_ntt(jnp.asarray(evals)))
    big = ntt.expand(jnp.asarray(coeffs), eb)
    big_evals = np.asarray(ntt.evaluate_ntt(big, eb))[0]
    # every 4th evaluation must equal the original
    assert np.array_equal(big_evals[:: 1 << eb], evals[0])


def test_np_matches_jnp(rng):
    n = 1 << 8
    x = rng.integers(0, F.P, size=(3, n), dtype=np.uint32)
    assert np.array_equal(ntt.interpolate_ntt_np(x), np.asarray(ntt.interpolate_ntt(jnp.asarray(x))))
    assert np.array_equal(ntt.evaluate_ntt_np(x), np.asarray(ntt.evaluate_ntt(jnp.asarray(x))))


def test_zk_shift(rng):
    # zk_shift on bit-reversed coeffs == multiplying natural coeff i by 3^i
    n_bits = 6
    n = 1 << n_bits
    evals = rng.integers(0, F.P, size=(1, n), dtype=np.uint32)
    br = np.asarray(ntt.interpolate_ntt(jnp.asarray(evals)))
    shifted = np.asarray(ntt.zk_shift(jnp.asarray(br)))
    perm = ntt._bitrev_perm(n_bits)
    nat = br[0][perm]  # natural-order coeffs
    nat_shifted = shifted[0][perm]
    three_pow = F.R % F.P
    for i in range(n):
        assert nat_shifted[i] == F.s_mul(int(nat[i]), three_pow)
        three_pow = F.s_mul(three_pow, F.s_encode(3))


def test_bit_reverse_involution(rng):
    x = rng.integers(0, F.P, size=(2, 64), dtype=np.uint32)
    y = np.asarray(ntt.bit_reverse(ntt.bit_reverse(jnp.asarray(x))))
    assert np.array_equal(y, x)
