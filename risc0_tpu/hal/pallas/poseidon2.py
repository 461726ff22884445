"""Pallas TPU kernels for batched Poseidon2 hashing.

The XLA-level implementation round-trips HBM for every elementwise op (the
(rows, 24) state exceeds VMEM), making Merkle hashing bandwidth-catastrophic.
These kernels keep the full 24-cell state VMEM-resident through all 29 rounds
(and across absorb chunks for hash_rows), so HBM traffic drops to the
input/output streams — the speed-of-light for this op.

Layout: planar (24, TILE) state — cells on the sublane axis (24 = 3x8 tiles),
rows on the 128-wide lane axis.  All values uint32 Montgomery form.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import field as F
from ...hash.poseidon2 import _MINT_MONT, _RC_MONT, CELLS, CELLS_OUT, CELLS_RATE

LANES = 128
DEFAULT_TILE = 512


def _mul(a, b):
    return F.mul(a, b)


def _add(a, b):
    return F.add(a, b)


def _sbox(x):
    x2 = _mul(x, x)
    x4 = _mul(x2, x2)
    return _mul(_mul(x4, x2), x)


def _permute_planar(cells):
    """cells: list of 24 (TILE,)-shaped values; returns new list.

    Fully unrolled permutation (mirrors hash/poseidon2.py semantics)."""
    rc = _RC_MONT  # (29, 24) numpy
    mint = _MINT_MONT

    def dbl(x):
        return _add(x, x)

    def m_ext(c):
        out = [None] * CELLS
        sums = [None] * 4
        for blk in range(CELLS // 4):
            c0, c1, c2, c3 = c[blk * 4 : blk * 4 + 4]
            t0 = _add(c0, c1)
            t1 = _add(c2, c3)
            t2 = _add(dbl(c1), t1)
            t3 = _add(dbl(c3), t0)
            t4 = _add(dbl(dbl(t1)), t3)
            t5 = _add(dbl(dbl(t0)), t2)
            t6 = _add(t3, t5)
            t7 = _add(t2, t4)
            o = (t6, t5, t7, t4)
            for j in range(4):
                out[blk * 4 + j] = o[j]
                sums[j] = o[j] if sums[j] is None else _add(sums[j], o[j])
        return [_add(out[i], sums[i % 4]) for i in range(CELLS)]

    def m_int(c):
        total = c[0]
        for i in range(1, CELLS):
            total = _add(total, c[i])
        return [_add(total, _mul(c[i], jnp.uint32(int(mint[i]))))
                for i in range(CELLS)]

    cells = m_ext(cells)
    rnd = 0
    for _ in range(4):
        cells = m_ext([_sbox(_add(c, jnp.uint32(int(rc[rnd][i]))))
                       for i, c in enumerate(cells)])
        rnd += 1
    for _ in range(21):
        c0 = _sbox(_add(cells[0], jnp.uint32(int(rc[rnd][0]))))
        cells = m_int([c0] + cells[1:])
        rnd += 1
    for _ in range(4):
        cells = m_ext([_sbox(_add(c, jnp.uint32(int(rc[rnd][i]))))
                       for i, c in enumerate(cells)])
        rnd += 1
    return cells


def _hash_rows_kernel(ncols: int):
    full, rem = divmod(ncols, CELLS_RATE)

    def kernel(mat_ref, out_ref):
        # mat_ref: (ncols, TILE); out_ref: (8, TILE)
        tile = mat_ref.shape[1]
        zeros = jnp.zeros((tile,), jnp.uint32)
        cells = [zeros] * CELLS
        for chunk in range(full):
            cells = [mat_ref[chunk * CELLS_RATE + i, :] for i in range(CELLS_RATE)] \
                + cells[CELLS_RATE:]
            cells = _permute_planar(cells)
        if rem != 0 or ncols == 0:
            absorb = [mat_ref[full * CELLS_RATE + i, :] if i < rem else zeros
                      for i in range(CELLS_RATE)]
            cells = absorb + cells[CELLS_RATE:]
            cells = _permute_planar(cells)
        for i in range(CELLS_OUT):
            out_ref[i, :] = cells[i]

    return kernel


@partial(jax.jit, static_argnames=("tile",))
def hash_rows(matrix, tile: int = DEFAULT_TILE):
    """Poseidon2 row hashing: (cols, rows) -> (rows, 8) digests."""
    cols, rows = matrix.shape
    tile = min(tile, rows)
    assert rows % tile == 0, f"rows {rows} not divisible by tile {tile}"
    out = pl.pallas_call(
        _hash_rows_kernel(cols),
        grid=(rows // tile,),
        in_specs=[pl.BlockSpec((cols, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CELLS_OUT, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CELLS_OUT, rows), jnp.uint32),
    )(matrix)
    return out.T  # (rows, 8)


def _hash_pairs_kernel(l_ref, r_ref, out_ref):
    tile = l_ref.shape[1]
    zeros = jnp.zeros((tile,), jnp.uint32)
    cells = [l_ref[i, :] for i in range(CELLS_OUT)] + \
            [r_ref[i, :] for i in range(CELLS_OUT)] + [zeros] * CELLS_OUT
    cells = _permute_planar(cells)
    for i in range(CELLS_OUT):
        out_ref[i, :] = cells[i]


@partial(jax.jit, static_argnames=("tile",))
def hash_pairs(left, right, tile: int = DEFAULT_TILE):
    """Batched pair hashing: (n, 8), (n, 8) -> (n, 8)."""
    n = left.shape[0]
    tile = min(tile, max(n, 1))
    lt = left.T  # (8, n)
    rt = right.T
    if n % tile != 0:
        pad = tile - n % tile
        lt = jnp.pad(lt, ((0, 0), (0, pad)))
        rt = jnp.pad(rt, ((0, 0), (0, pad)))
    padded = lt.shape[1]
    out = pl.pallas_call(
        _hash_pairs_kernel,
        grid=(padded // tile,),
        in_specs=[
            pl.BlockSpec((CELLS_OUT, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CELLS_OUT, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CELLS_OUT, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CELLS_OUT, padded), jnp.uint32),
    )(lt, rt)
    return out[:, :n].T
