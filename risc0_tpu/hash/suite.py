"""Hash suites + Fiat-Shamir RNGs (host side).

Mirrors the reference suite abstraction (risc0/zkp/src/core/hash/mod.rs:26-60)
with two suites: "poseidon2" (risc0/zkp/src/core/hash/poseidon2/) and "sha-256"
(risc0/zkp/src/core/hash/sha/).  Digests are numpy (8,) uint32 arrays.

The transcript RNG is inherently sequential and tiny, so it lives on the host;
bulk hashing (Merkle rows/folds) runs on device through the HAL.
"""

from __future__ import annotations

import numpy as np

from .. import field as F
from . import poseidon2 as p2
from . import sha256 as sha


class Poseidon2Rng:
    """Reference: risc0/zkp/src/core/hash/poseidon2/rng.rs:26-90."""

    def __init__(self):
        self.cells = np.zeros(p2.CELLS, np.uint32)
        self.pool_used = 0

    def mix(self, digest):
        if self.pool_used != 0:
            self.cells = p2.permute_np(self.cells)
            self.pool_used = 0
        d = np.asarray(digest, np.uint32)
        self.cells[: p2.CELLS_OUT] = F.add_np(self.cells[: p2.CELLS_OUT], d)
        self.cells = p2.permute_np(self.cells)

    def random_elem(self) -> int:
        """Returns a Montgomery-form element."""
        if self.pool_used == p2.CELLS_RATE:
            self.cells = p2.permute_np(self.cells)
            self.pool_used = 0
        out = int(self.cells[self.pool_used])
        self.pool_used += 1
        return out

    def random_bits(self, bits: int) -> int:
        # Draw 4 elems, keep the first nonzero (rng.rs:66-74); mask low bits of
        # the *standard-form* value.
        val = F.s_decode(self.random_elem())
        for _ in range(3):
            new_val = F.s_decode(self.random_elem())
            if val == 0:
                val = new_val
        return ((1 << bits) - 1) & val

    def random_ext_elem(self) -> np.ndarray:
        """Returns (4,) uint32 Montgomery."""
        return np.array([self.random_elem() for _ in range(4)], np.uint32)


class ShaRng:
    """Reference: risc0/zkp/src/core/hash/sha/rng.rs:26-103."""

    def __init__(self):
        self.pool0 = sha.hash_bytes(b"Hello")
        self.pool1 = sha.hash_bytes(b"World")
        self.pool_used = 0

    def _step(self):
        self.pool0 = sha.hash_pair(self.pool0, self.pool1)
        self.pool1 = sha.hash_pair(self.pool0, self.pool1)
        self.pool_used = 0

    def mix(self, digest):
        self.pool0 = np.bitwise_xor(self.pool0, np.asarray(digest, np.uint32))
        self._step()

    def next_u32(self) -> int:
        if self.pool_used == 8:
            self._step()
        out = int(self.pool0[self.pool_used])
        self.pool_used += 1
        return out

    def random_bits(self, bits: int) -> int:
        return ((1 << bits) - 1) & self.next_u32()

    def random_elem(self) -> int:
        # [0, 2^192) % P via 6 u32 draws (reference baby_bear.rs:109-141);
        # result returned in Montgomery form.
        val = 0
        for _ in range(6):
            val = ((val << 32) + self.next_u32()) % F.P
        return F.s_encode(val)

    def random_ext_elem(self) -> np.ndarray:
        return np.array([self.random_elem() for _ in range(4)], np.uint32)


class HashSuite:
    """Bundle of hash functions + RNG factory, digest = (8,) uint32 words."""

    def __init__(self, name: str):
        assert name in ("poseidon2", "sha-256", "poseidon254", "blake2b")
        self.name = name

    def new_rng(self):
        if self.name == "poseidon254":
            from .poseidon254 import Poseidon254Rng
            return Poseidon254Rng()
        if self.name == "blake2b":
            from .blake2b import Blake2bRng
            return Blake2bRng()
        return Poseidon2Rng() if self.name == "poseidon2" else ShaRng()

    def hash_pair(self, a, b) -> np.ndarray:
        if self.name == "poseidon2":
            return p2.hash_pair_np(a, b)
        if self.name == "poseidon254":
            from . import poseidon254 as p254
            return p254.hash_pair(a, b)
        if self.name == "blake2b":
            from . import blake2b as b2
            return b2.hash_pair(a, b)
        return sha.hash_pair(a, b)

    def hash_elem_slice(self, elems) -> np.ndarray:
        """elems: 1-D uint32 Montgomery-form array (ext elems flattened)."""
        if self.name == "poseidon2":
            return p2.unpadded_hash_np(elems)
        if self.name == "poseidon254":
            from . import poseidon254 as p254
            return p254.unpadded_hash(elems)
        if self.name == "blake2b":
            from . import blake2b as b2
            return b2.hash_elem_slice(elems)
        return sha.hash_raw_words(elems)


POSEIDON2 = HashSuite("poseidon2")
SHA256 = HashSuite("sha-256")
POSEIDON254 = HashSuite("poseidon254")
BLAKE2B = HashSuite("blake2b")


def get_suite(name: str) -> HashSuite:
    return {"poseidon2": POSEIDON2, "sha256": SHA256, "sha-256": SHA256,
            "poseidon254": POSEIDON254, "poseidon_254": POSEIDON254,
            "blake2b": BLAKE2B}[name]
