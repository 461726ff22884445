"""BabyBear field (p = 15·2^27 + 1) and its degree-4 extension, TPU-native.

Semantics mirror the reference field (reference: risc0/core/src/field/baby_bear.rs),
but the implementation is built for JAX/XLA on TPU: all element arrays are
`uint32` ndarrays in **Montgomery form** (R = 2^32), and the 32x32->64 bit
multiplies needed by Montgomery reduction (REDC) are emulated with 16-bit limb
products so every op lowers to plain 32-bit VPU integer ops.

Two mirrored implementations are provided:
  * `jnp` ops (work under `jax.jit`, on TPU or CPU backends), used by the HAL.
  * `numpy` host ops (suffix `_np`, use uint64 intermediates), used by the
    Fiat-Shamir transcript, small protocol math, and as a conformance oracle.

Extension field layout: trailing axis of size 4 over F_p[x]/(x^4 + 11)
(reference: baby_bear.rs:363-375,559-560).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Constants (see reference risc0/core/src/field/baby_bear.rs:40-41,84,178-200)
# ---------------------------------------------------------------------------

P = 15 * (1 << 27) + 1  # 2013265921 == 0x78000001
M = 0x88000001          # P^{-1} mod 2^32 (REDC constant)
R = (1 << 32) % P       # Montgomery R mod P = 268435454
R2 = (R * R) % P        # 1172168163, used to encode into Montgomery form
INVALID = 0xFFFFFFFF
BETA = 11
NBETA = P - 11
EXT_SIZE = 4
MAX_ROU_PO2 = 27

# Forward/reverse roots of unity per power of two, standard (non-Montgomery)
# form.  ROU_FWD[i] is a primitive 2^i-th root; ROU_REV[i] = ROU_FWD[i]^-1.
# (reference: baby_bear.rs:178-200; verified in tests by squaring relations)
ROU_FWD = [
    1, 2013265920, 284861408, 1801542727, 567209306, 740045640, 918899846,
    1881002012, 1453957774, 65325759, 1538055801, 515192888, 483885487,
    157393079, 1695124103, 2005211659, 1540072241, 88064245, 1542985445,
    1269900459, 1461624142, 825701067, 682402162, 1311873874, 1164520853,
    352275361, 18769, 137,
]
ROU_REV = [
    1, 2013265920, 1728404513, 1592366214, 196396260, 1253260071, 72041623,
    1091445674, 145223211, 1446820157, 1030796471, 2010749425, 1827366325,
    1239938613, 246299276, 596347512, 1893145354, 246074437, 1525739923,
    1194341128, 1463599021, 704606912, 95395244, 15672543, 647517488,
    584175179, 137728885, 749463956,
]

_U32 = np.uint32
_U64 = np.uint64


# ---------------------------------------------------------------------------
# Host (numpy) ops — uint64 intermediates, Montgomery form uint32 arrays
# ---------------------------------------------------------------------------

# The host ops below intentionally wrap uint64 intermediates (REDC's
# (-o64) & mask step); a per-call np.errstate context costs ~5us which
# dominated the transcript math (r3 profile: 812k __enter__ calls = 1.5s
# per prove), so integer-overflow warnings are silenced process-wide here.
np.seterr(over="ignore")


def mul_np(a, b):
    """Montgomery product of uint32 arrays (both in Montgomery form)."""
    a = np.asarray(a, _U64)
    b = np.asarray(b, _U64)
    o64 = a * b
    low = (-o64) & _U64(0xFFFFFFFF)
    red = (_U64(M) * low) & _U64(0xFFFFFFFF)
    o64 = o64 + red * _U64(P)
    ret = (o64 >> _U64(32)).astype(_U64)
    return np.where(ret >= P, ret - _U64(P), ret).astype(_U32)


def add_np(a, b):
    x = np.asarray(a, _U64) + np.asarray(b, _U64)
    return np.where(x >= P, x - _U64(P), x).astype(_U32)


def sub_np(a, b):
    x = np.asarray(a, _U64) + _U64(P) - np.asarray(b, _U64)
    return np.where(x >= P, x - _U64(P), x).astype(_U32)


def neg_np(a):
    a = np.asarray(a, _U32)
    return np.where(a == 0, a, (_U64(P) - a).astype(_U32))


def encode_np(a):
    """Standard form -> Montgomery form."""
    return mul_np(np.asarray(a, _U32), np.full_like(np.asarray(a, _U32), R2))


def decode_np(a):
    """Montgomery form -> standard form."""
    return mul_np(np.asarray(a, _U32), np.ones_like(np.asarray(a, _U32)))


def pow_np(a, e: int):
    """a^e with a in Montgomery form, e a host integer."""
    a = np.asarray(a, _U32)
    result = np.full_like(a, R % P)  # Montgomery ONE
    while e > 0:
        if e & 1:
            result = mul_np(result, a)
        a = mul_np(a, a)
        e >>= 1
    return result


def inv_np(a):
    """Multiplicative inverse (inv(0) == 0, reference baby_bear.rs:105-107)."""
    return pow_np(a, P - 2)


# Extension field (trailing axis 4), numpy -------------------------------------

def ext_mul_np(a, b):
    a = np.asarray(a, _U32)
    b = np.asarray(b, _U32)
    a0, a1, a2, a3 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    b0, b1, b2, b3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    nbeta = encode_np(np.array(NBETA, _U32))
    m, ad = mul_np, add_np
    c0 = ad(m(a0, b0), m(nbeta, ad(ad(m(a1, b3), m(a2, b2)), m(a3, b1))))
    c1 = ad(ad(m(a0, b1), m(a1, b0)), m(nbeta, ad(m(a2, b3), m(a3, b2))))
    c2 = ad(ad(m(a0, b2), ad(m(a1, b1), m(a2, b0))), m(nbeta, m(a3, b3)))
    c3 = ad(ad(m(a0, b3), m(a1, b2)), ad(m(a2, b1), m(a3, b0)))
    return np.stack([c0, c1, c2, c3], axis=-1)


def ext_inv_np(a):
    """Inverse in F_p4 via composite-field method (reference baby_bear.rs:448-481)."""
    a = np.asarray(a, _U32)
    a0, a1, a2, a3 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    beta = encode_np(np.array(BETA, _U32))
    nbeta = encode_np(np.array(NBETA, _U32))
    m, ad, sb = mul_np, add_np, sub_np
    b0 = ad(m(a0, a0), m(beta, sb(m(a1, ad(a3, a3)), m(a2, a2))))
    b2 = ad(sb(m(a0, ad(a2, a2)), m(a1, a1)), m(beta, m(a3, a3)))
    c = ad(m(b0, b0), m(beta, m(b2, b2)))
    ic = inv_np(c)
    b0 = m(b0, ic)
    b2 = m(b2, ic)
    o0 = ad(m(a0, b0), m(beta, m(a2, b2)))
    o1 = ad(m(neg_np(a1), b0), m(nbeta, m(a3, b2)))
    o2 = ad(m(neg_np(a0), b2), m(a2, b0))
    o3 = sb(m(a1, b2), m(a3, b0))
    return np.stack([o0, o1, o2, o3], axis=-1)


def ext_pow_np(a, e: int):
    a = np.asarray(a, _U32)
    result = np.zeros_like(a)
    result[..., 0] = R % P  # ONE
    while e > 0:
        if e & 1:
            result = ext_mul_np(result, a)
        a = ext_mul_np(a, a)
        e >>= 1
    return result


def ext_powers_np(x, n: int):
    """(4,) -> (n, 4) powers x^0..x^{n-1} (Montgomery), by doubling —
    O(log n) batched ext muls instead of n sequential scalar ones."""
    out = np.zeros((max(n, 1), 4), _U32)
    out[0, 0] = R % P  # ONE
    cur = np.asarray(x, _U32)
    length = 1
    while length < n:
        k = min(length, n - length)
        out[length : length + k] = ext_mul_np(out[:k], cur[None, :])
        cur = ext_mul_np(cur, cur)
        length *= 2
    return out


def from_subfield_np(a):
    """Lift base elems (...,) to ext elems (..., 4)."""
    a = np.asarray(a, _U32)
    out = np.zeros(a.shape + (4,), _U32)
    out[..., 0] = a
    return out


# ---------------------------------------------------------------------------
# Device (jnp) ops — pure uint32, 16-bit limb emulation of 32x32->64
# ---------------------------------------------------------------------------

def _mulhi(a, b):
    """High 32 bits of a*b for uint32 arrays, via 16-bit limbs."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    lo = a0 * b0
    t = a1 * b0 + (lo >> 16)          # < 2^32: (2^16-1)^2 + (2^16-1)
    t2 = a0 * b1 + (t & 0xFFFF)       # < 2^32
    return a1 * b1 + (t >> 16) + (t2 >> 16)


def mul(a, b):
    """Montgomery product (REDC) of uint32 jnp arrays in Montgomery form.

    Mirrors reference baby_bear.rs:337-350 with the 64-bit product split into
    (hi, lo) 32-bit halves so it runs on the TPU VPU.
    """
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    hi = _mulhi(a, b)
    lo = a * b
    red = (jnp.uint32(M) * lo)        # M * lo mod 2^32; note -lo*(-M) trick below
    # REDC: o64 + red'*P == 0 mod 2^32 with red' = M * (-lo).  Using
    # red' = -red (mod 2^32) gives identical residue since M*P == 1 mod 2^32.
    redp = (jnp.uint32(0) - red)
    # hi part of redp * P, plus carry from the (exactly cancelling) low halves.
    carry = (lo != 0).astype(jnp.uint32)
    ret = hi + _mulhi(redp, jnp.uint32(P)) + carry
    return jnp.where(ret >= P, ret - P, ret)


def add(a, b):
    x = a.astype(jnp.uint32) + b.astype(jnp.uint32)  # < 2^32 since both < P < 2^31
    return jnp.where(x >= P, x - P, x)


def sub(a, b):
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    x = a + jnp.uint32(P) - b
    return jnp.where(x >= P, x - P, x)


def neg(a):
    a = a.astype(jnp.uint32)
    return jnp.where(a == 0, a, jnp.uint32(P) - a)


def encode(a):
    return mul(a, jnp.full_like(a, R2, dtype=jnp.uint32))


def decode(a):
    return mul(a, jnp.ones_like(a, dtype=jnp.uint32))


def pow_static(a, e: int):
    """a^e elementwise for a static host integer exponent."""
    result = jnp.full_like(a, R % P, dtype=jnp.uint32)  # Montgomery ONE
    while e > 0:
        if e & 1:
            result = mul(result, a)
        a = mul(a, a)
        e >>= 1
    return result


def inv(a):
    return pow_static(a, P - 2)


MONT_ONE = R % P
MONT_BETA = (BETA * R) % P
MONT_NBETA = (NBETA * R) % P


def ext_mul(a, b):
    """F_p4 product on (..., 4) uint32 jnp arrays."""
    a0, a1, a2, a3 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    b0, b1, b2, b3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    nbeta = jnp.full_like(a0, MONT_NBETA, dtype=jnp.uint32)
    c0 = add(mul(a0, b0), mul(nbeta, add(add(mul(a1, b3), mul(a2, b2)), mul(a3, b1))))
    c1 = add(add(mul(a0, b1), mul(a1, b0)), mul(nbeta, add(mul(a2, b3), mul(a3, b2))))
    c2 = add(add(mul(a0, b2), add(mul(a1, b1), mul(a2, b0))), mul(nbeta, mul(a3, b3)))
    c3 = add(add(mul(a0, b3), mul(a1, b2)), add(mul(a2, b1), mul(a3, b0)))
    return jnp.stack([c0, c1, c2, c3], axis=-1)


def ext_scale(a, s):
    """Multiply ext (..., 4) by base scalar array s (broadcast over last axis)."""
    return mul(a, s[..., None] if s.ndim == a.ndim - 1 else s)


def ext_add(a, b):
    return add(a, b)


def ext_sub(a, b):
    return sub(a, b)


def ext_pow_static(a, e: int):
    shape = a.shape
    result = jnp.zeros(shape, jnp.uint32).at[..., 0].set(MONT_ONE)
    while e > 0:
        if e & 1:
            result = ext_mul(result, a)
        a = ext_mul(a, a)
        e >>= 1
    return result


def from_subfield(a):
    out = jnp.zeros(a.shape + (4,), jnp.uint32)
    return out.at[..., 0].set(a)


# ---------------------------------------------------------------------------
# Host scalar helpers (python ints, Montgomery form) for transcript-side math
# ---------------------------------------------------------------------------

def s_mul(a: int, b: int) -> int:
    o64 = a * b
    low = (-o64) & 0xFFFFFFFF
    red = (M * low) & 0xFFFFFFFF
    o64 += red * P
    ret = o64 >> 32
    return ret - P if ret >= P else ret


def s_add(a: int, b: int) -> int:
    x = a + b
    return x - P if x >= P else x


def s_sub(a: int, b: int) -> int:
    x = a - b
    return x + P if x < 0 else x


def s_encode(a: int) -> int:
    return s_mul(a % P, R2)


def s_decode(a: int) -> int:
    return s_mul(a, 1)


def s_pow(a: int, e: int) -> int:
    result = R % P
    while e > 0:
        if e & 1:
            result = s_mul(result, a)
        a = s_mul(a, a)
        e >>= 1
    return result


def s_inv(a: int) -> int:
    return s_pow(a, P - 2)
