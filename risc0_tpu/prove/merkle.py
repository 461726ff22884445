"""Merkle tree prover (reference: risc0/zkp/src/prove/merkle.rs,
risc0/zkp/src/merkle.rs).

Layers are built on device; the top layer (largest layer with <= queries
nodes) is written wholesale into the seal so queries only need paths below it.
"""

from __future__ import annotations

import numpy as np

from ..hal import jnp_hal as hal


def merkle_params(row_size: int, queries: int):
    layers = row_size.bit_length() - 1
    assert 1 << layers == row_size
    top_layer = 0
    for i in range(1, layers):
        if (1 << i) > queries:
            break
        top_layer = i
    return layers, 1 << top_layer


class MerkleTreeProver:
    """matrix: (cols, rows) device uint32 (Montgomery); leaf r hashes column r."""

    def __init__(self, matrix, queries: int = 50, suite_name: str = "poseidon2",
                 layers=None):
        self.matrix = matrix
        self.cols, self.rows = matrix.shape
        self.num_layers, self.top_size = merkle_params(self.rows, queries)
        # layers[0] = leaves (rows,8) ... layers[-1] = root (1,8); may be
        # precomputed by the fused commit pipeline (hal.commit_pipeline)
        self.layers = (layers if layers is not None
                       else hal.merkle_layers(matrix, suite_name))
        self.root = np.asarray(self.layers[-1][0])

    def commit(self, iop):
        # top layer wholesale (reference prove/merkle.rs:84-90): nodes with
        # virtual heap indices [top_size, 2*top_size)
        top_level = self.num_layers - (self.top_size.bit_length() - 1)
        top = np.asarray(self.layers[top_level])  # (top_size, 8)
        iop.write_digests(top)
        iop.commit(self.root)

    def prove(self, iop, idx: int):
        """Write column values + uncle path for leaf idx (prove/merkle.rs:92-140)."""
        col = np.asarray(self.matrix[:, idx])
        iop.write_field_elems(col)
        v = idx + self.rows
        level = 0
        while v >= 2 * self.top_size:
            uncle = np.asarray(self.layers[level][(v ^ 1) - (self.rows >> level)])
            iop.write_digests(uncle)
            v //= 2
            level += 1
        return col

    def prefetch(self, positions) -> "_PrefetchedProofs":
        """Gather all query openings in a handful of device ops.

        Fiat-Shamir only advances on commits, so all 50 query positions are
        drawn before any opening is written — letting the per-query gathers
        batch into one device op per tree/level instead of one per query.
        """
        import jax.numpy as jnp

        pos = np.asarray(positions, np.int64)
        cols = np.asarray(self.matrix[:, jnp.asarray(pos)])  # (cols, Q)
        uncles = []  # per level: (Q, 8)
        v = pos + self.rows
        level = 0
        while (v >= 2 * self.top_size).any():
            idxs = (v ^ 1) - (self.rows >> level)
            uncles.append(np.asarray(self.layers[level])[idxs])
            v //= 2
            level += 1
        return _PrefetchedProofs(cols, uncles)


class _PrefetchedProofs:
    def __init__(self, cols, uncles):
        self.cols = cols
        self.uncles = uncles

    def write(self, iop, qi: int):
        iop.write_field_elems(self.cols[:, qi])
        for level in self.uncles:
            iop.write_digests(level[qi])
