"""FRI low-degree proof, prover side (reference: risc0/zkp/src/prove/fri.rs).

Rounds of [4x LDE -> Merkle commit -> draw fold mix -> fold x16] until the
polynomial has <= 256 coefficients, then 50 queries with Merkle openings.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import ntt
from ..hal import jnp_hal as hal
from .merkle import MerkleTreeProver

INV_RATE = 4
FRI_FOLD = 16
FRI_MIN_DEGREE = 256
QUERIES = 50


class _ProveRound:
    def __init__(self, iop, coeffs):
        # coeffs: (4, size) planar bit-reversed ext poly
        size = coeffs.shape[1]
        self.domain = size * INV_RATE
        evaluated = hal.expand_evaluate(coeffs, 2)  # (4, domain)
        matrix = evaluated.reshape(FRI_FOLD * 4, self.domain // FRI_FOLD)
        self.merkle = MerkleTreeProver(matrix, QUERIES, iop.suite.name)
        self.merkle.commit(iop)
        fold_mix = jnp.asarray(iop.random_ext_elem())
        self.coeffs = hal.fri_fold(coeffs, fold_mix)  # (4, size/16)


import jax


@jax.jit
def _final_and_digest(coeffs):
    """bit-reverse the final FRI coeffs and sponge-hash them in one
    dispatch; returns [final.ravel() | digest(8)]."""
    from ..hash import poseidon2 as p2

    final = ntt.bit_reverse(coeffs)
    digest = p2._hash_rows_impl(final.reshape(-1)[:, None])[0]
    return jnp.concatenate([final.reshape(-1), digest])


def fri_prove(iop, final_poly_coeffs, inner):
    """final_poly_coeffs: (4, cycles) planar bit-reversed ext poly.

    `inner(iop, pos)` writes the caller's per-query openings (group Merkle
    proofs).  Mirrors reference fri.rs:86-126.
    """
    from .. import perf

    coeffs = final_poly_coeffs
    orig_domain = coeffs.shape[1] * INV_RATE
    rounds = []
    with perf.scope("rounds"):
        while coeffs.shape[1] > FRI_MIN_DEGREE:
            rnd = _ProveRound(iop, coeffs)
            rounds.append(rnd)
            coeffs = rnd.coeffs
        # final coefficients in natural order + their digest, ONE readback
        if iop.suite.name == "poseidon2" and not isinstance(
                coeffs, np.ndarray):
            flat = np.asarray(_final_and_digest(coeffs))
            final = flat[:-8].reshape(coeffs.shape)
            digest = flat[-8:]
        else:
            final = np.asarray(ntt.bit_reverse(coeffs))
            digest = iop.suite.hash_elem_slice(final.ravel())
    iop.write_field_elems(final)
    iop.commit(digest)

    # Queries: the RNG advances only on draws (writes never mix), so drawing
    # all positions up front matches the reference's interleaved schedule and
    # lets every Merkle opening prefetch in one batched gather.
    positions = [iop.random_bits(orig_domain.bit_length() - 1)
                 for _ in range(QUERIES)]
    round_positions = []
    cur = positions
    for rnd in rounds:
        cur = [p % (rnd.domain // FRI_FOLD) for p in cur]
        round_positions.append(cur)
    with perf.scope("round_prefetch"):
        prefetched = [rnd.merkle.prefetch(ps)
                      for rnd, ps in zip(rounds, round_positions)]

    with perf.scope("inner_prefetch"):
        inner_prefetched = inner(positions)
    with perf.scope("query_write"):
        for qi in range(QUERIES):
            inner_prefetched(iop, qi)
            for pf in prefetched:
                pf.write(iop, qi)
