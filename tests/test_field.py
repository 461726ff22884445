"""BabyBear field conformance: jnp device ops vs numpy host ops vs python ints."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from risc0_tpu import field as F


def rand_elems(rng, n):
    return rng.integers(0, F.P, size=n, dtype=np.uint32)


def test_montgomery_roundtrip(rng):
    x = rand_elems(rng, 1000)
    m = F.encode_np(x)
    assert np.array_equal(F.decode_np(m), x)


def test_mul_matches_int_semantics(rng):
    a = rand_elems(rng, 1000)
    b = rand_elems(rng, 1000)
    am, bm = F.encode_np(a), F.encode_np(b)
    got = F.decode_np(F.mul_np(am, bm))
    want = (a.astype(np.uint64) * b.astype(np.uint64) % F.P).astype(np.uint32)
    assert np.array_equal(got, want)


def test_jnp_ops_match_numpy(rng):
    a = rand_elems(rng, 4096)
    b = rand_elems(rng, 4096)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    assert np.array_equal(np.asarray(jax.jit(F.mul)(ja, jb)), F.mul_np(a, b))
    assert np.array_equal(np.asarray(jax.jit(F.add)(ja, jb)), F.add_np(a, b))
    assert np.array_equal(np.asarray(jax.jit(F.sub)(ja, jb)), F.sub_np(a, b))
    assert np.array_equal(np.asarray(jax.jit(F.neg)(ja)), F.neg_np(a))
    assert np.array_equal(np.asarray(jax.jit(F.inv)(ja)), F.inv_np(a))
    assert np.array_equal(np.asarray(F.encode(ja)), F.encode_np(a))
    assert np.array_equal(np.asarray(F.decode(ja)), F.decode_np(a))


def test_mul_edge_cases():
    edge = np.array([0, 1, F.P - 1, F.P - 2, 2, F.R % F.P], dtype=np.uint32)
    a, b = np.meshgrid(edge, edge)
    a, b = a.ravel(), b.ravel()
    got = np.asarray(F.mul(jnp.asarray(a), jnp.asarray(b)))
    assert np.array_equal(got, F.mul_np(a, b))


def test_inverse(rng):
    a = rand_elems(rng, 100) + 1
    am = F.encode_np(a % F.P)
    prod = F.mul_np(am, F.inv_np(am))
    assert np.all(F.decode_np(prod) == 1)
    # inv(0) == 0 (reference baby_bear.rs:105)
    assert F.inv_np(np.zeros(1, np.uint32))[0] == 0


def test_roots_of_unity():
    # ROU_FWD[i]^2 == ROU_FWD[i-1]; ROU_FWD[i]*ROU_REV[i] == 1
    for i in range(1, 28):
        f = F.s_encode(F.ROU_FWD[i])
        r = F.s_encode(F.ROU_REV[i])
        assert F.s_decode(F.s_mul(f, f)) == F.ROU_FWD[i - 1]
        assert F.s_decode(F.s_mul(f, r)) == 1
    # order check: ROU_FWD[27]^(2^27) == 1 and ^(2^26) != 1
    x = F.s_encode(F.ROU_FWD[27])
    assert F.s_decode(F.s_pow(x, 1 << 27)) == 1
    assert F.s_decode(F.s_pow(x, 1 << 26)) != 1


def test_ext_mul_matches(rng):
    a = rand_elems(rng, 64 * 4).reshape(64, 4)
    b = rand_elems(rng, 64 * 4).reshape(64, 4)
    got = np.asarray(jax.jit(F.ext_mul)(jnp.asarray(a), jnp.asarray(b)))
    assert np.array_equal(got, F.ext_mul_np(a, b))


def test_ext_inv(rng):
    a = rand_elems(rng, 64 * 4).reshape(64, 4)
    ia = F.ext_inv_np(a)
    prod = F.ext_mul_np(a, ia)
    one = np.zeros((64, 4), np.uint32)
    one[:, 0] = F.R % F.P
    assert np.array_equal(prod, one)


def test_ext_mul_commutes_and_beta(rng):
    # x * x for x = (0,1,0,0) should be (0,0,1,0); x^4 = -11
    x = np.zeros((1, 4), np.uint32)
    x[0, 1] = F.R % F.P  # ONE in slot 1
    x2 = F.ext_mul_np(x, x)
    assert F.decode_np(x2[0])[2] == 1
    x4 = F.ext_mul_np(x2, x2)
    assert F.decode_np(x4[0])[0] == F.P - 11
    assert np.all(x4[0][1:] == 0)


def test_ext_pow(rng):
    a = rand_elems(rng, 4).reshape(4)
    e = 153
    got = F.ext_pow_np(a, e)
    want = a.copy().reshape(1, 4)
    acc = np.zeros((1, 4), np.uint32)
    acc[0, 0] = F.R % F.P
    for _ in range(e):
        acc = F.ext_mul_np(acc, want)
    assert np.array_equal(got, acc[0])
    jgot = np.asarray(F.ext_pow_static(jnp.asarray(a).reshape(1, 4), e))
    assert np.array_equal(jgot[0], got)
