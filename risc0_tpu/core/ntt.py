"""Batched BabyBear NTT for TPU.

Same math as the reference NTT (risc0/zkp/src/core/ntt.rs): coefficient arrays
are stored **bit-reversed**, evaluation arrays in natural order.

  * ``evaluate_ntt(x, expand_bits)``: DIT butterflies from bit-reversed coeffs
    to natural-order evaluations, skipping the bottom ``expand_bits`` stages
    (inputs produced by ``expand`` are constant inside those blocks).
  * ``interpolate_ntt(x)``: DIF butterflies from natural evaluations to
    bit-reversed coefficients, scaled by 1/n.

Unlike the reference's recursive scalar code, stages here are fully vectorized
reshapes + VPU field ops over a (batch, n) array, so XLA tiles each stage
across the chip; twiddle tables are a single power table per direction with
strided slicing per stage.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from .. import field as F


def log2_ceil(n: int) -> int:
    b = (n - 1).bit_length()
    assert 1 << b == n or n == 1, f"not a power of two: {n}"
    return b if n > 1 else 0


@lru_cache(maxsize=None)
def _bitrev_perm(n_bits: int) -> np.ndarray:
    n = 1 << n_bits
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, np.int32)
    for b in range(n_bits):
        rev |= (((idx >> b) & 1) << (n_bits - 1 - b)).astype(np.int32)
    return rev


@lru_cache(maxsize=None)
def _twiddles(n_bits: int, fwd: bool) -> np.ndarray:
    """Powers w^0..w^(n/2-1) of the (inverse) 2^n_bits-th root, Montgomery."""
    root = F.ROU_FWD[n_bits] if fwd else F.ROU_REV[n_bits]
    half = 1 << (n_bits - 1)
    out = np.empty(half, np.uint64)
    cur = F.R % F.P
    rm = F.s_encode(root)
    for i in range(half):
        out[i] = cur
        cur = F.s_mul(cur, rm)
    return out.astype(np.uint32)


@lru_cache(maxsize=None)
def _zk_shift_table(n_bits: int) -> np.ndarray:
    """3^rev(pos) for each bit-reversed position (reference hal/cpu.rs:395-408)."""
    n = 1 << n_bits
    pow3 = np.empty(n, np.uint32)
    cur = F.R % F.P
    three = F.s_encode(3)
    for i in range(n):
        pow3[i] = cur
        cur = F.s_mul(cur, three)
    return pow3[_bitrev_perm(n_bits)]


def evaluate_ntt(x, expand_bits: int = 0):
    """(batch..., n) bit-reversed coeffs -> natural evaluations."""
    n = x.shape[-1]
    n_bits = log2_ceil(n)
    tw_full = jnp.asarray(_twiddles(n_bits, fwd=True)) if n_bits > 0 else None
    for l in range(expand_bits + 1, n_bits + 1):
        half = 1 << (l - 1)
        stride = 1 << (n_bits - l)
        tw = tw_full[::stride] if l < n_bits else tw_full  # ROU_FWD[l]^i
        y = x.reshape(x.shape[:-1] + (n >> l, 2, half))
        a = y[..., 0, :]
        b = F.mul(y[..., 1, :], tw)
        y = jnp.stack([F.add(a, b), F.sub(a, b)], axis=-2)
        x = y.reshape(x.shape)
    return x


def interpolate_ntt(x):
    """(batch..., n) natural evaluations -> bit-reversed coeffs (scaled 1/n)."""
    n = x.shape[-1]
    n_bits = log2_ceil(n)
    if n_bits == 0:
        return x
    tw_full = jnp.asarray(_twiddles(n_bits, fwd=False))
    for l in range(n_bits, 0, -1):
        half = 1 << (l - 1)
        stride = 1 << (n_bits - l)
        tw = tw_full[::stride] if l < n_bits else tw_full  # ROU_REV[l]^i
        y = x.reshape(x.shape[:-1] + (n >> l, 2, half))
        a = y[..., 0, :]
        b = y[..., 1, :]
        y = jnp.stack([F.add(a, b), F.mul(F.sub(a, b), tw)], axis=-2)
        x = y.reshape(x.shape)
    norm = F.s_inv(F.s_encode(n % F.P))
    return F.mul(x, jnp.full(x.shape, norm, jnp.uint32))


def bit_reverse(x):
    """Apply the bit-reversal permutation along the last axis."""
    n_bits = log2_ceil(x.shape[-1])
    perm = jnp.asarray(_bitrev_perm(n_bits))
    return x[..., perm]


def expand(x, expand_bits: int):
    """Repeat each element 2^expand_bits times (reference ntt.rs:334-347)."""
    return jnp.repeat(x, 1 << expand_bits, axis=-1)


def zk_shift(x):
    """f(x) -> f(3x) on bit-reversed coeffs (multiply coeff i by 3^i)."""
    n_bits = log2_ceil(x.shape[-1])
    return F.mul(x, jnp.asarray(_zk_shift_table(n_bits)))


# Host (numpy) mirrors for oracle testing --------------------------------------

def interpolate_ntt_np(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.uint32)
    n = x.shape[-1]
    n_bits = log2_ceil(n)
    for l in range(n_bits, 0, -1):
        half = 1 << (l - 1)
        stride = 1 << (n_bits - l)
        tw = _twiddles(n_bits, fwd=False)[::stride]
        y = x.reshape(x.shape[:-1] + (n >> l, 2, half))
        a, b = y[..., 0, :], y[..., 1, :]
        y = np.stack([F.add_np(a, b), F.mul_np(F.sub_np(a, b), tw)], axis=-2)
        x = y.reshape(x.shape)
    norm = F.s_inv(F.s_encode(n % F.P))
    return F.mul_np(x, np.full(x.shape, norm, np.uint32))


def evaluate_ntt_np(x: np.ndarray, expand_bits: int = 0) -> np.ndarray:
    x = np.asarray(x, np.uint32)
    n = x.shape[-1]
    n_bits = log2_ceil(n)
    for l in range(expand_bits + 1, n_bits + 1):
        half = 1 << (l - 1)
        stride = 1 << (n_bits - l)
        tw = _twiddles(n_bits, fwd=True)[::stride]
        y = x.reshape(x.shape[:-1] + (n >> l, 2, half))
        a = y[..., 0, :]
        b = F.mul_np(y[..., 1, :], tw)
        y = np.stack([F.add_np(a, b), F.sub_np(a, b)], axis=-2)
        x = y.reshape(x.shape)
    return x
