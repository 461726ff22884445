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
        self._root = None

    @property
    def root(self):
        if self._root is None:
            self._root = np.asarray(self.layers[-1][0])
        return self._root

    def commit(self, iop):
        # top layer wholesale (reference prove/merkle.rs:84-90): nodes with
        # virtual heap indices [top_size, 2*top_size); ONE readback covers
        # the top layer AND the root (each device->host hop is ~80ms
        # through the relay)
        import jax.numpy as jnp

        top_level = self.num_layers - (self.top_size.bit_length() - 1)
        if self._root is None and \
                not isinstance(self.layers[-1], np.ndarray):
            fused = np.asarray(jnp.concatenate(
                [jnp.asarray(self.layers[top_level]).reshape(-1),
                 jnp.asarray(self.layers[-1]).reshape(-1)]))
            top = fused[: self.top_size * 8].reshape(self.top_size, 8)
            self._root = fused[self.top_size * 8 :]
        else:
            top = np.asarray(self.layers[top_level])
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
        if isinstance(self.matrix, np.ndarray):  # host-suite trees
            cols = self.matrix[:, pos]
            uncles = []
            v = pos + self.rows
            level = 0
            while (v >= 2 * self.top_size).any():
                idxs = (v ^ 1) - (self.rows >> level)
                uncles.append(np.asarray(self.layers[level])[idxs])
                v //= 2
                level += 1
            return _PrefetchedProofs(cols, uncles)
        # ONE device gather + ONE readback covers the opened columns and
        # all uncle digests across levels (np.asarray(layers[level]) pulled
        # whole leaf layers to host — 128MB/group at po2=20 — and each
        # extra device->host hop is ~80ms through the relay)
        q = len(pos)
        cols_d = self.matrix[:, jnp.asarray(pos)]  # (cols, Q) device
        gathered = []  # per level: (Q, 8) device
        v = pos + self.rows
        level = 0
        while (v >= 2 * self.top_size).any():
            idxs = (v ^ 1) - (self.rows >> level)
            gathered.append(jnp.asarray(self.layers[level])[
                jnp.asarray(idxs)])
            v //= 2
            level += 1
        parts = [jnp.asarray(cols_d).reshape(-1)] + \
            [g.reshape(-1) for g in gathered]
        flat = np.asarray(jnp.concatenate(parts))
        cols = flat[: self.cols * q].reshape(self.cols, q)
        off = self.cols * q
        uncles = []
        for _ in gathered:
            uncles.append(flat[off : off + q * 8].reshape(q, 8))
            off += q * 8
        return _PrefetchedProofs(cols, uncles)


class _PrefetchedProofs:
    def __init__(self, cols, uncles):
        self.cols = cols
        self.uncles = uncles

    def write(self, iop, qi: int):
        iop.write_field_elems(self.cols[:, qi])
        for level in self.uncles:
            iop.write_digests(level[qi])
