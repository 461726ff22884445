"""Fused multi-stage NTT Pallas kernels.

The XLA NTT (core/ntt.py) runs one butterfly stage per HBM round-trip:
n_bits passes of read+write over the whole (batch, n) array.  These
kernels use the classic two-pass (four-step) factorization instead:

  * bit-reversed coefficients make stages 1..k LOCAL to contiguous
    2^k-element blocks -> pass 1 runs all of them inside one VMEM tile;
  * stages k+1..n_bits pair elements at block distance; after an XLA
    transpose of the (n/2^k, 2^k) view they are local again, and their
    twiddles are SEPARABLE: tw(i) = W^((q mod 2^(l-1-k))*2^k*s) * W^(r*s)
    = A_l[q'] * B_l[r] (outer product of two small tables) -> pass 2 runs
    the remaining stages in VMEM on the transposed array.

HBM traffic drops from 2*n_bits*n words to ~6n (two passes + the
transpose), the right target for this bandwidth-bound op.  All math is
the same u32 Montgomery VPU arithmetic as the jnp path, so results are
bit-identical (tests/test_pallas_ntt.py asserts exact equality).

Reference semantics: risc0/zkp/src/core/ntt.rs (evaluate/interpolate with
bit-reversed coefficient order).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ... import field as F
from ...core import ntt as ntt_mod

LANES = 128


def _pow_table(base: int, count: int) -> np.ndarray:
    out = np.empty(count, np.uint32)
    cur = F.R % F.P
    for i in range(count):
        out[i] = cur
        cur = F.s_mul(cur, base)
    return out


@lru_cache(maxsize=None)
def _stage_tables(n_bits: int, fwd: bool, lo: int, hi: int):
    """Per-stage twiddle tables for LOCAL stages lo..hi (1-indexed,
    inclusive): stage l uses tw[t] = W^(t * 2^(n_bits-l)), t < 2^(l-1)."""
    root = F.ROU_FWD[n_bits] if fwd else F.ROU_REV[n_bits]
    rm = F.s_encode(root)
    tabs = []
    for l in range(lo, hi + 1):
        step = F.s_pow(rm, 1 << (n_bits - l))
        tabs.append(_pow_table(step, 1 << (l - 1)))
    return tabs


@lru_cache(maxsize=None)
def _outer_tables(n_bits: int, fwd: bool, k: int):
    """Separable twiddles for OUTER stages k+1..n_bits: stage l has
    A_l[q'] (q' < 2^(l-1-k)) and B_l[r] (r < 2^k)."""
    root = F.ROU_FWD[n_bits] if fwd else F.ROU_REV[n_bits]
    rm = F.s_encode(root)
    tabs = []
    for l in range(k + 1, n_bits + 1):
        s = 1 << (n_bits - l)
        a_step = F.s_pow(rm, s << k)
        b_step = F.s_pow(rm, s)
        tabs.append((_pow_table(a_step, 1 << (l - 1 - k)),
                     _pow_table(b_step, 1 << k)))
    return tabs


def _local_stages(x, tabs, fwd: bool):
    """Run local butterfly stages on a (..., block) array; each table's
    length is the stage's half (so tabs may be ascending for DIT or
    descending for DIF).  `tabs` are (1, half) refs/arrays."""
    n = x.shape[-1]
    for tab in tabs:
        tw = tab[0] if tab.ndim == 2 else tab
        half = tw.shape[-1]
        l = half.bit_length()  # 2*half = 2^l block span
        y = x.reshape(x.shape[:-1] + (n >> l, 2, half))
        a = y[..., 0, :]
        b = y[..., 1, :]
        if fwd:  # DIT: inputs bit-reversed
            bt = F.mul(b, tw)
            y = jnp.stack([F.add(a, bt), F.sub(a, bt)], axis=-2)
        else:    # DIF: outputs bit-reversed
            y = jnp.stack([F.add(a, b), F.mul(F.sub(a, b), tw)], axis=-2)
        x = y.reshape(x.shape)
    return x


def _outer_stage(x, a_tab, b_tab, fwd: bool):
    """One outer stage on the transposed (rows=2^k, m) array: pairs are
    column-distance half_q apart; twiddle = A[q'] (lane) x B[r] (sublane)."""
    rows, m = x.shape[-2], x.shape[-1]
    half_q = len(a_tab)
    a = jnp.asarray(a_tab)          # (half_q,)
    b_col = jnp.asarray(b_tab)      # (rows,) == 2^k
    y = x.reshape(x.shape[:-1] + (m // (2 * half_q), 2, half_q))
    tw = F.mul(jnp.broadcast_to(a, (rows, 1, half_q)),
               b_col[:, None, None])
    p = y[..., 0, :]
    q = y[..., 1, :]
    if fwd:
        qt = F.mul(q, tw)
        y = jnp.stack([F.add(p, qt), F.sub(p, qt)], axis=-2)
    else:
        y = jnp.stack([F.add(p, q), F.mul(F.sub(p, q), tw)], axis=-2)
    return y.reshape(x.shape)


def _choose_k(n_bits: int) -> int:
    # local block 2^k: big enough to amortize, small enough for VMEM
    # (block bytes = bt * 2^k * 4; bt=8, k=13 -> 256 KB)
    return min(13, max(n_bits // 2 + 1, n_bits - 13))


def evaluate_ntt(x, expand_bits: int = 0, interpret: bool = False):
    """Bit-reversed coeffs (batch, n) -> natural evaluations; exact
    drop-in for core.ntt.evaluate_ntt."""
    batch, n = x.shape
    n_bits = ntt_mod.log2_ceil(n)
    k = _choose_k(n_bits)
    if n_bits <= k or expand_bits >= k:
        return ntt_mod.evaluate_ntt(x, expand_bits)

    local_tabs = _stage_tables(n_bits, True, expand_bits + 1, k)
    outer_tabs = _outer_tables(n_bits, True, k)
    blk = 1 << k
    m = n // blk
    batch0 = batch
    pad = (-batch) % 8  # sublane-align the batch tiles
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        batch += pad
    bt = 8

    def pass1(ref, *rest):
        tab_refs, out = rest[:-1], rest[-1]
        out[:] = _local_stages(ref[:], [t[:] for t in tab_refs], True)

    x = pl.pallas_call(
        pass1,
        out_shape=jax.ShapeDtypeStruct((batch, n), jnp.uint32),
        grid=(batch // bt, m),
        in_specs=[pl.BlockSpec((bt, blk), lambda i, j: (i, j))] +
                 [pl.BlockSpec((1, len(t)), lambda i, j: (0, 0))
                  for t in local_tabs],
        out_specs=pl.BlockSpec((bt, blk), lambda i, j: (i, j)),
        interpret=interpret,
    )(x, *[t[None, :] for t in local_tabs])

    # outer stages on the transposed view: rows=2^k (intra-block offset),
    # cols=m (block index)
    xt = jnp.swapaxes(x.reshape(batch, m, blk), -1, -2)  # (batch, blk, m)

    flat = [t for ab in outer_tabs for t in ab]

    def pass2(ref, *rest):
        tab_refs, out = rest[:-1], rest[-1]
        v = ref[0]
        for i in range(len(outer_tabs)):
            v = _outer_stage(v, tab_refs[2 * i][0], tab_refs[2 * i + 1][0],
                             True)
        out[0] = v

    xt = pl.pallas_call(
        pass2,
        out_shape=jax.ShapeDtypeStruct((batch, blk, m), jnp.uint32),
        grid=(batch,),
        in_specs=[pl.BlockSpec((1, blk, m), lambda i: (i, 0, 0))] +
                 [pl.BlockSpec((1, len(t)), lambda i: (0, 0))
                  for t in flat],
        out_specs=pl.BlockSpec((1, blk, m), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(xt, *[t[None, :] for t in flat])
    return jnp.swapaxes(xt, -1, -2).reshape(batch, n)[:batch0]


def interpolate_ntt(x, interpret: bool = False):
    """Natural evaluations -> bit-reversed coeffs scaled by 1/n; exact
    drop-in for core.ntt.interpolate_ntt."""
    batch, n = x.shape
    n_bits = ntt_mod.log2_ceil(n)
    k = _choose_k(n_bits)
    if n_bits <= k:
        return ntt_mod.interpolate_ntt(x)

    local_tabs = _stage_tables(n_bits, False, 1, k)
    outer_tabs = _outer_tables(n_bits, False, k)
    blk = 1 << k
    m = n // blk
    batch0 = batch
    pad = (-batch) % 8
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        batch += pad
    bt = 8
    norm = F.s_inv(F.s_encode(n % F.P))

    # iNTT runs stages n_bits..1: outer stages first (transposed), then
    # the local ones, with the 1/n scale fused into pass 2
    xt = jnp.swapaxes(x.reshape(batch, m, blk), -1, -2)

    flat = [t for ab in reversed(outer_tabs) for t in ab]

    def pass1(ref, *rest):
        tab_refs, out = rest[:-1], rest[-1]
        v = ref[0]
        for i in range(len(outer_tabs)):
            v = _outer_stage(v, tab_refs[2 * i][0], tab_refs[2 * i + 1][0],
                             False)
        out[0] = v

    xt = pl.pallas_call(
        pass1,
        out_shape=jax.ShapeDtypeStruct((batch, blk, m), jnp.uint32),
        grid=(batch,),
        in_specs=[pl.BlockSpec((1, blk, m), lambda i: (i, 0, 0))] +
                 [pl.BlockSpec((1, len(t)), lambda i: (0, 0))
                  for t in flat],
        out_specs=pl.BlockSpec((1, blk, m), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(xt, *[t[None, :] for t in flat])
    x = jnp.swapaxes(xt, -1, -2).reshape(batch, n)

    rev_tabs = list(reversed(local_tabs))

    def pass2(ref, *rest):
        tab_refs, out = rest[:-1], rest[-1]
        v = _local_stages(ref[:], [t[:] for t in tab_refs], False)
        out[:] = F.mul(v, jnp.full_like(v, norm))

    return pl.pallas_call(
        pass2,
        out_shape=jax.ShapeDtypeStruct((batch, n), jnp.uint32),
        grid=(batch // bt, m),
        in_specs=[pl.BlockSpec((bt, blk), lambda i, j: (i, j))] +
                 [pl.BlockSpec((1, len(t)), lambda i, j: (0, 0))
                  for t in rev_tabs],
        out_specs=pl.BlockSpec((bt, blk), lambda i, j: (i, j)),
        interpret=interpret,
    )(x, *[t[None, :] for t in rev_tabs])[:batch0]
