"""Poseidon2 permutation over BabyBear (t=24), batched for TPU.

Semantics mirror the reference permutation (risc0/zkp/src/core/hash/poseidon2/
mod.rs:103-216): initial external MDS layer, 4 full rounds, 21 partial rounds,
4 full rounds; S-box x^7; external matrix = circ(2*M4, M4, ...) applied via the
appendix-B butterfly; internal matrix = all-ones + diag(M_INT_DIAG_HZN).

All state arrays are uint32 in Montgomery form with shape (..., 24); the
permutation is fully vectorized over leading axes so Merkle `hash_rows` /
`hash_fold` batches map straight onto the TPU VPU.  The device version rolls
the rounds with `lax.fori_loop` to keep the XLA graph small; a mirrored numpy
implementation drives the host-side Fiat-Shamir transcript.

Digest convention (reference mod.rs:96-101): a digest is the first 8 cells of
the state, exported as raw Montgomery words.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from .. import field as F
from .poseidon2_consts import (
    CELLS,
    CELLS_OUT,
    CELLS_RATE,
    M_INT_DIAG_HZN,
    ROUND_CONSTANTS,
    ROUNDS_HALF_FULL,
    ROUNDS_PARTIAL,
)

# Constants in Montgomery form (host numpy arrays).
_RC_MONT = F.encode_np(np.array(ROUND_CONSTANTS, np.uint32)).reshape(-1, CELLS)
_MINT_MONT = F.encode_np(np.array(M_INT_DIAG_HZN, np.uint32))
_ROUNDS = 2 * ROUNDS_HALF_FULL + ROUNDS_PARTIAL


def _mk(xp, fmul, fadd):
    """Shared building blocks for numpy / jnp backends."""

    def dbl(x):
        return fadd(x, x)

    def sbox(x):
        x2 = fmul(x, x)
        x4 = fmul(x2, x2)
        return fmul(fmul(x4, x2), x)

    def m_ext(state):
        # blocks (..., 6, 4); 4x4 circulant butterfly (mod.rs:137-176)
        b = state.reshape(state.shape[:-1] + (CELLS // 4, 4))
        c0, c1, c2, c3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        t0 = fadd(c0, c1)
        t1 = fadd(c2, c3)
        t2 = fadd(dbl(c1), t1)
        t3 = fadd(dbl(c3), t0)
        t4 = fadd(dbl(dbl(t1)), t3)
        t5 = fadd(dbl(dbl(t0)), t2)
        t6 = fadd(t3, t5)
        t7 = fadd(t2, t4)
        out = xp.stack([t6, t5, t7, t4], axis=-1)  # (..., 6, 4)
        # tmp_sums[j] = sum over the 6 blocks (tree of field adds)
        s = fadd(fadd(out[..., 0, :], out[..., 1, :]),
                 fadd(out[..., 2, :], out[..., 3, :]))
        s = fadd(s, fadd(out[..., 4, :], out[..., 5, :]))
        out = fadd(out, s[..., None, :])
        return out.reshape(state.shape)

    return sbox, m_ext


# ---------------------------------------------------------------------------
# numpy host version
# ---------------------------------------------------------------------------

_sbox_np, _m_ext_np = _mk(np, F.mul_np, F.add_np)


def _m_int_np(state):
    x = state
    t = F.add_np(x[..., 0::2], x[..., 1::2])
    t = F.add_np(t[..., 0::2], t[..., 1::2])
    t = F.add_np(t[..., 0::2], t[..., 1::2])
    total = F.add_np(F.add_np(t[..., 0], t[..., 1]), t[..., 2])
    return F.add_np(total[..., None], F.mul_np(state, _MINT_MONT))


def permute_np(state: np.ndarray) -> np.ndarray:
    state = _m_ext_np(state)
    rnd = 0
    for _ in range(ROUNDS_HALF_FULL):
        state = _m_ext_np(_sbox_np(F.add_np(state, _RC_MONT[rnd])))
        rnd += 1
    for _ in range(ROUNDS_PARTIAL):
        c0 = _sbox_np(F.add_np(state[..., 0], _RC_MONT[rnd][0]))
        state = np.concatenate([c0[..., None], state[..., 1:]], axis=-1)
        state = _m_int_np(state)
        rnd += 1
    for _ in range(ROUNDS_HALF_FULL):
        state = _m_ext_np(_sbox_np(F.add_np(state, _RC_MONT[rnd])))
        rnd += 1
    return state


# ---------------------------------------------------------------------------
# jnp device version (rolled rounds, jit-friendly)
# ---------------------------------------------------------------------------

_sbox_j, _m_ext_j = _mk(jnp, F.mul, F.add)


def _m_int_j(state, mint):
    x = state
    t = F.add(x[..., 0::2], x[..., 1::2])
    t = F.add(t[..., 0::2], t[..., 1::2])
    t = F.add(t[..., 0::2], t[..., 1::2])
    total = F.add(F.add(t[..., 0], t[..., 1]), t[..., 2])
    return F.add(total[..., None], F.mul(state, mint))


def permute(state):
    """Poseidon2 permutation on (..., 24) uint32 Montgomery jnp arrays."""
    rc = jnp.asarray(_RC_MONT)
    mint = jnp.asarray(_MINT_MONT)
    state = _m_ext_j(state)

    def full_round(i, st):
        return _m_ext_j(_sbox_j(F.add(st, rc[i])))

    def partial_round(i, st):
        c0 = _sbox_j(F.add(st[..., 0], rc[i, 0]))
        st = jnp.concatenate([c0[..., None], st[..., 1:]], axis=-1)
        return _m_int_j(st, mint)

    state = jax.lax.fori_loop(0, ROUNDS_HALF_FULL, full_round, state)
    state = jax.lax.fori_loop(
        ROUNDS_HALF_FULL, ROUNDS_HALF_FULL + ROUNDS_PARTIAL, partial_round, state)
    state = jax.lax.fori_loop(
        ROUNDS_HALF_FULL + ROUNDS_PARTIAL, _ROUNDS, full_round, state)
    return state


def unpadded_hash_np(elems: np.ndarray) -> np.ndarray:
    """Host unpadded sponge hash of a 1-D Montgomery-form array.

    Mirrors reference mod.rs:221-245: rate-16 absorb with *set* (not add),
    zero-padding the final partial block; returns an 8-word digest
    (Montgomery words).
    """
    elems = np.asarray(elems, np.uint32).ravel()
    n = len(elems)
    if n >= 512:
        # long absorbs (coeff_u / final-FRI commits) run as ONE device
        # dispatch via the scanned sponge — the sequential host sponge was
        # ~6.6ms per permutation (r3 profile: 1.7s/prove)
        return np.asarray(_hash_rows_impl(elems[:, None]))[0].copy()
    state = np.zeros(CELLS, np.uint32)
    full, rem = divmod(n, CELLS_RATE)
    for i in range(full):
        state[:CELLS_RATE] = elems[i * CELLS_RATE : (i + 1) * CELLS_RATE]
        state = permute_np(state)
    if rem != 0 or n == 0:
        state[:rem] = elems[full * CELLS_RATE :]
        state[rem:CELLS_RATE] = 0
        state = permute_np(state)
    return state[:CELLS_OUT].copy()


def hash_pair_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hash two 8-word digests (Montgomery words; reference mod.rs:47-60)."""
    return unpadded_hash_np(
        np.concatenate([np.asarray(a, np.uint32), np.asarray(b, np.uint32)]))


# ---------------------------------------------------------------------------
# Batched device hashing
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=())
def _hash_rows_impl(matrix):
    """Rate-16 absorb as ONE lax.scan over column chunks: the compiled
    program carries a single permutation body instead of ceil(cols/16)
    unrolled copies (remote-compile time scales with HLO size; the absorb
    is sequential either way).  Zero-padding the last partial chunk is
    exactly the reference's set-with-zero-fill semantics."""
    cols, rows = matrix.shape
    nchunks = max(1, -(-cols // CELLS_RATE))
    pad = nchunks * CELLS_RATE - cols
    mp = jnp.pad(matrix, ((0, pad), (0, 0)))
    chunks = mp.reshape(nchunks, CELLS_RATE, rows)

    def body(st, chunk):
        st = st.at[:, :CELLS_RATE].set(chunk.T)
        return permute(st), None

    state = jnp.zeros((rows, CELLS), jnp.uint32)
    state, _ = jax.lax.scan(body, state, chunks)
    return state[:, :CELLS_OUT]


def _use_pallas() -> bool:
    import os

    flag = os.environ.get("RISC0_TPU_PALLAS", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def hash_rows(matrix):
    """Hash each column-tuple of `matrix` ((cols, rows) uint32 Montgomery).

    Equivalent to reference CpuHal::hash_rows (hal/cpu.rs:555-567): output[r] =
    unpadded_hash(matrix[:, r]).  Returns (rows, 8) digest words.

    On TPU this routes to the VMEM-resident Pallas kernel
    (hal/pallas/poseidon2.py); the jnp path is the reference/CPU fallback.
    """
    rows = matrix.shape[1]
    if _use_pallas() and rows >= 512 and rows % 512 == 0:
        from ..hal.pallas import poseidon2 as pk

        return pk.hash_rows(matrix)
    return _hash_rows_impl(matrix)


def hash_pairs(left, right):
    """Batched hash_pair: (n, 8), (n, 8) -> (n, 8).

    Stays on the XLA path: Merkle fold layers span many shapes and the
    per-shape Pallas compile cost (~100s via remote compile) dwarfs the
    ~20% runtime win; the leaf hash_rows is where Pallas pays off.
    """
    return _hash_pairs_impl(left, right)


@jax.jit
def _hash_pairs_impl(left, right):
    state = jnp.zeros((left.shape[0], CELLS), jnp.uint32)
    state = state.at[:, :CELLS_OUT].set(left)
    state = state.at[:, CELLS_OUT : 2 * CELLS_OUT].set(right)
    return permute(state)[:, :CELLS_OUT]
