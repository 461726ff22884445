"""Device op layer ("HAL") built on jnp — runs on TPU or CPU backends.

Op semantics mirror the reference Hal trait (risc0/zkp/src/hal/mod.rs:55-258)
and its CPU implementation (hal/cpu.rs:305-660), but signatures are natural
JAX array shapes instead of flat buffers:

  * base-element polynomial batches: uint32 (count, n), Montgomery form
  * extension elements: trailing axis of size 4

Everything here is jit-compatible; the prover wraps phases in `jax.jit` keyed
by static shapes.  A Pallas kernel path can override individual ops.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .. import field as F
from ..core import ntt
from ..hash import poseidon2 as p2

INV_RATE = 4
FRI_FOLD = 16


# ---------------------------------------------------------------------------
# Polynomial ops
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("zk_shift",))
def make_coeffs(witness, zk_shift: bool = True):
    """iNTT each row and apply the zk shift f(x)->f(3x).

    Matches reference make_coeffs (prove/prover.rs:38-48); returns bit-reversed
    coefficients.
    """
    coeffs = ntt.interpolate_ntt(witness)
    if zk_shift:
        coeffs = ntt.zk_shift(coeffs)
    return coeffs


@partial(jax.jit, static_argnames=("expand_bits",))
def expand_evaluate(coeffs, expand_bits: int = 2):
    """Bit-reversed coeffs (count, n) -> evaluations over the 2^eb larger domain."""
    return ntt.evaluate_ntt(ntt.expand(coeffs, expand_bits), expand_bits)


def _ext_powers(x, n: int):
    """(... ,4) -> (..., n, 4) powers x^0..x^{n-1} by doubling."""
    powers = jnp.zeros(x.shape[:-1] + (1, 4), jnp.uint32).at[..., 0, 0].set(F.MONT_ONE)
    cur = x
    length = 1
    while length < n:
        nxt = F.ext_mul(powers, cur[..., None, :])
        powers = jnp.concatenate([powers, nxt], axis=-2)
        cur = F.ext_mul(cur, cur)
        length *= 2
    return powers[..., :n, :]


def _ext_tree_sum(x, axis: int):
    """Field-add reduction along `axis` (log-depth)."""
    x = jnp.moveaxis(x, axis, 0)
    while x.shape[0] > 1:
        m = x.shape[0] // 2
        head = F.add(x[: 2 * m : 2], x[1 : 2 * m : 2])
        x = jnp.concatenate([head, x[2 * m :]], axis=0) if x.shape[0] % 2 else head
    return x[0]


def batch_evaluate_any(coeffs_nat, which, xs, chunk: int = 256):
    return _batch_evaluate_any(coeffs_nat, tuple(int(w) for w in which), xs,
                               min(chunk, coeffs_nat.shape[-1]))


@partial(jax.jit, static_argnames=("which", "chunk"))
def _batch_evaluate_any(coeffs_nat, which, xs, chunk):
    """Evaluate polys at ext points: out[k] = P_{which[k]}(xs[k]).

    coeffs_nat: (count, n) natural-order coefficients.
    which: (k,) host ints; xs: (k, 4) ext points.  Returns (k, 4).

    Chunked Horner: inner chunks use a powers table (k, chunk, 4), the outer
    loop is a `lax.scan` with the x^chunk step factor — memory stays at
    O(k*chunk) instead of O(k*n) (reference hal/cpu.rs:362-393 is scalar
    Horner per tap).
    """
    n = coeffs_nat.shape[-1]
    sel = coeffs_nat[np.asarray(which)]  # (k, n)
    k = sel.shape[0]
    powers = _ext_powers(xs, chunk)  # (k, chunk, 4)
    x_chunk = _ext_powers(xs, chunk + 1)[:, chunk]  # xs^chunk (k, 4)
    nchunks = n // chunk
    chunks = sel.reshape(k, nchunks, chunk).transpose(1, 0, 2)  # (nchunks, k, chunk)

    def body(carry, cvals):
        acc, xc = carry
        terms = F.mul(powers, cvals[..., None])  # (k, chunk, 4)
        partial = _ext_tree_sum(terms, axis=1)  # (k, 4)
        acc = F.add(acc, F.ext_mul(partial, xc))
        xc = F.ext_mul(xc, x_chunk)
        return (acc, xc), None

    init = (jnp.zeros((k, 4), jnp.uint32),
            jnp.zeros((k, 4), jnp.uint32).at[:, 0].set(F.MONT_ONE))
    (acc, _), _ = jax.lax.scan(body, init, chunks)
    return acc


def mix_poly_coeffs(combos, mix_pows, input_coeffs, which, combo_count: int):
    return _mix_poly_coeffs(combos, mix_pows, input_coeffs,
                            tuple(int(w) for w in which), combo_count)


@partial(jax.jit, static_argnames=("which", "combo_count"))
def _mix_poly_coeffs(combos, mix_pows, input_coeffs, which, combo_count: int):
    """combos[c] += sum_{i: which[i]==c} mix_pows[i] * input[i].

    combos: (combo_count+1, n, 4); mix_pows: (count, 4); input: (count, n);
    which: (count,) int.  Matches reference hal/cpu.rs:410-456.
    """
    which = np.asarray(which)
    scaled = F.mul(mix_pows[:, None, :], input_coeffs[..., None])  # (count, n, 4)
    updates = []
    for c in range(combo_count + 1):
        members = np.nonzero(which == c)[0]
        if len(members) == 0:
            updates.append(jnp.zeros(scaled.shape[1:], jnp.uint32))
        else:
            updates.append(_ext_tree_sum(scaled[members], axis=0))
    return F.add(combos, jnp.stack(updates))


def evaluate_tap_groups(coeffs_groups, group_ids, cols, backs, xs_distinct,
                        back_idx, chunk: int = 4096):
    """All tap evaluations in ONE jitted dispatch: out[t] =
    P_{group_ids[t], cols[t]}(xs_distinct[back_idx[t]]).

    coeffs_groups: list of (count_g, n) natural-order coeff arrays (device);
    group_ids/cols/back_idx: host int arrays (num_taps,); xs_distinct:
    (nb, 4) ext points.  Replaces per-group `batch_evaluate_any` calls (the
    r2 tap_eval hotspot: 3 dispatches + a 200MB row-duplicating gather).

    Chunked over the coefficient axis: per chunk, build the powers block
    x^(i0..i0+T) for the nb distinct points (log-doubled base powers times a
    scanned carry), gather per-tap rows, multiply and tree-reduce mod P.
    """
    import jax

    n = coeffs_groups[0].shape[-1]
    offs = np.cumsum([0] + [g.shape[0] for g in coeffs_groups])
    col_g = tuple(int(c) + int(offs[g]) for g, c in zip(group_ids, cols))
    C = jnp.concatenate([jnp.asarray(g) for g in coeffs_groups], axis=0)
    return _evaluate_tap_groups(
        C, col_g, tuple(int(b) for b in back_idx),
        jnp.asarray(np.asarray(xs_distinct, np.uint32)),
        min(chunk, n))


_MONT_2_16 = (65536 * F.R) % F.P


def _sum_mod_p(terms, axis):
    """Bit-exact field sum along axis (u32-only): 16-bit halves summed
    separately (k < 2^15 terms keeps partials < 2^31), recombined mod P."""
    assert terms.shape[axis] < (1 << 15)
    lo = jnp.sum(terms & jnp.uint32(0xFFFF), axis=axis) % jnp.uint32(F.P)
    hi = jnp.sum(terms >> jnp.uint32(16), axis=axis) % jnp.uint32(F.P)
    return F.add(lo, F.mul(hi, jnp.uint32(_MONT_2_16)))


@partial(jax.jit, static_argnames=("col_g", "back_idx", "chunk"))
def _evaluate_tap_groups(C, col_g, back_idx, xs, chunk):
    n = C.shape[-1]
    T = chunk
    nch = n // T
    cols = jnp.asarray(np.asarray(col_g, np.int32))
    bidx = np.asarray(back_idx, np.int32)
    XPb = _ext_powers(xs, T)                      # (nb, T, 4)
    xT = _ext_powers(xs, T + 1)[:, T]             # (nb, 4)

    def body(carry, i0):
        cur = carry                               # (nb, 4) = xs^(i0)
        Cc = jax.lax.dynamic_slice(C, (0, i0), (C.shape[0], T))[cols]
        XP = F.ext_mul(cur[:, None, :], XPb)      # (nb, T, 4)
        XPt = XP[jnp.asarray(bidx)]               # (k, T, 4)
        terms = F.mul(XPt, Cc[:, :, None])        # (k, T, 4)
        part = _sum_mod_p(terms, axis=1)          # (k, 4)
        return F.ext_mul(cur, xT), part

    ones = jnp.zeros_like(xs).at[:, 0].set(F.MONT_ONE)
    _, parts = jax.lax.scan(
        body, ones, jnp.arange(nch, dtype=jnp.int32) * T)
    return _sum_mod_p(parts, axis=0)              # (k, 4)


def _poly_divide_rows(p, zs):
    """Row-batched synthetic division: row i of p (m, n, 4) divided by
    (x - zs[i]); zs (m, 4), all nonzero.  Same prefix-sum formulation as
    poly_divide_ext."""
    m, n, _ = p.shape
    zpow = _ext_powers(zs, n)                       # (m, n, 4)
    pz = F.ext_mul(p, zpow)
    s = jax.lax.associative_scan(F.add, pz[:, ::-1], axis=1)[:, ::-1]
    remainder = s[:, 0]
    s_next = jnp.concatenate(
        [s[:, 1:], jnp.zeros((m, 1, 4), jnp.uint32)], axis=1)
    zinv = ext_inv_device(zs)                       # (m, 4)
    zinv_pows = F.ext_mul(_ext_powers(zinv, n), zinv[:, None, :])
    return F.ext_mul(s_next, zinv_pows), remainder


@jax.jit
def combos_divide(combos, zs_levels, active_levels, z_check):
    """Divide every combo row by its sequence of (x - z_cb) factors and the
    check row by (x - z^4), in ONE dispatch (replaces the r2 per-divide
    host loop with its per-call remainder readbacks).

    combos: (m, n, 4); zs_levels: (L, m, 4) per-level divisor points (1 for
    inactive); active_levels: (L, m) bool.  Returns (combos', rems) where
    rems stacks all (forced-zero-if-inactive) remainders for one host check.
    """
    def level(cur, zs_act):
        zs, act = zs_act
        q, rem = _poly_divide_rows(cur, zs)
        cur = jnp.where(act[:, None, None], q, cur)
        rem = jnp.where(act[:, None], rem, 0)
        return cur, rem

    combos, rems = jax.lax.scan(level, combos, (zs_levels, active_levels))
    qc, remc = _poly_divide_rows(
        combos[-1:], jnp.broadcast_to(z_check, (1, 4)))
    combos = combos.at[-1].set(qc[0])
    return combos, jnp.concatenate([rems.reshape(-1, 4), remc], axis=0)


@jax.jit
def combos_subtract_head(combos, corr):
    """combos[:, :w] -= corr for a small host-computed correction block
    (combos_prepare without pulling the full array to host).

    combos: (m, n, 4); corr: (m, w, 4) with w << n."""
    w = corr.shape[1]
    return combos.at[:, :w].set(F.sub(combos[:, :w], corr))


@jax.jit
def poly_divide_ext(p, z):
    """Synthetic division of each row by (x - z); p: (m, n, 4) natural coeffs.

    out[i] = sum_{j>i} p[j] z^{j-i-1}; remainder = sum_j p[j] z^j.
    Uses the prefix-sum formulation: s_i = sum_{j>=i} p_j z^j, out_i =
    s_{i+1} * z^{-(i+1)}.  Requires z != 0 (z is a random DEEP point).
    Returns (out, remainder).
    """
    m, n, _ = p.shape
    zpow = _ext_powers(z, n)  # (n, 4): z^j
    pz = F.ext_mul(p, zpow[None, :, :])  # p_j z^j
    # suffix sums: s_i = sum_{j>=i} pz_j
    rev = pz[:, ::-1]
    csum = jax.lax.associative_scan(F.add, rev, axis=1)
    s = csum[:, ::-1]  # s[i] = sum_{j>=i} pz[j]
    remainder = s[:, 0]
    s_next = jnp.concatenate([s[:, 1:], jnp.zeros((m, 1, 4), jnp.uint32)], axis=1)
    zinv = ext_inv_device(z)
    zinv_pows = F.ext_mul(_ext_powers(zinv, n), zinv[None, :])  # z^{-(i+1)}
    out = F.ext_mul(s_next, zinv_pows[None, :, :])
    return out, remainder


def _ext_pow_device(a, e: int):
    result = jnp.zeros(4, jnp.uint32).at[0].set(F.MONT_ONE)
    while e > 0:
        if e & 1:
            result = F.ext_mul(result, a)
        a = F.ext_mul(a, a)
        e >>= 1
    return result


def ext_inv_device(a):
    """F_p4 inverse of a single (4,) element on device."""
    return F.ext_mul(
        _ext_conj_num(a), F.from_subfield(F.inv(_ext_norm(a)))
    )


def _ext_norm(a):
    # norm = b0^2 + BETA*b2^2 with b0,b2 from the composite-field method
    a0, a1, a2, a3 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    beta = jnp.asarray(np.uint32(F.MONT_BETA))
    b0 = F.add(F.mul(a0, a0), F.mul(beta, F.sub(F.mul(a1, F.add(a3, a3)), F.mul(a2, a2))))
    b2 = F.add(F.sub(F.mul(a0, F.add(a2, a2)), F.mul(a1, a1)), F.mul(beta, F.mul(a3, a3)))
    return F.add(F.mul(b0, b0), F.mul(beta, F.mul(b2, b2)))


def _ext_conj_num(a):
    a0, a1, a2, a3 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    beta = jnp.asarray(np.uint32(F.MONT_BETA))
    nbeta = jnp.asarray(np.uint32(F.MONT_NBETA))
    b0 = F.add(F.mul(a0, a0), F.mul(beta, F.sub(F.mul(a1, F.add(a3, a3)), F.mul(a2, a2))))
    b2 = F.add(F.sub(F.mul(a0, F.add(a2, a2)), F.mul(a1, a1)), F.mul(beta, F.mul(a3, a3)))
    o0 = F.add(F.mul(a0, b0), F.mul(beta, F.mul(a2, b2)))
    o1 = F.add(F.mul(F.neg(a1), b0), F.mul(nbeta, F.mul(a3, b2)))
    o2 = F.add(F.mul(F.neg(a0), b2), F.mul(a2, b0))
    o3 = F.sub(F.mul(a1, b2), F.mul(a3, b0))
    return jnp.stack([o0, o1, o2, o3], axis=-1)


@jax.jit
def eltwise_sum_extelem(combos):
    """Sum (m, n, 4) ext polys -> (4, n) base-planar buffer (hal/cpu.rs:475-501)."""
    acc = combos[0]
    for i in range(1, combos.shape[0]):
        acc = F.add(acc, combos[i])
    return acc.T  # (4, n)


@jax.jit
def fri_fold(planar_coeffs, mix):
    """One FRI fold-by-16 (reference hal/cpu.rs:524-553).

    planar_coeffs: (4, k) bit-reversed ext poly as 4 base rows, k = out*16.
    mix: (4,) ext.  Returns (4, out).
    """
    four, k = planar_coeffs.shape
    out = k // FRI_FOLD
    # input[i * k + rev_idx] with rev_idx = rev(i)*out + idx
    rev = np.array([int(f"{i:04b}"[::-1], 2) for i in range(FRI_FOLD)])
    # gather: folds[i] = planar[:, rev[i]*out : rev[i]*out+out] -> ext (out, 4)
    mix_pow = jnp.zeros((4,), jnp.uint32).at[0].set(F.MONT_ONE)
    tot = jnp.zeros((out, 4), jnp.uint32)
    for i in range(FRI_FOLD):
        factor = planar_coeffs[:, rev[i] * out : (rev[i] + 1) * out].T  # (out, 4)
        tot = F.add(tot, F.ext_mul(mix_pow[None, :], factor))
        mix_pow = F.ext_mul(mix_pow, mix)
    return tot.T  # (4, out)


# ---------------------------------------------------------------------------
# Merkle hashing
# ---------------------------------------------------------------------------

# Multi-chip sharding (SURVEY §2.10.4/5): when a mesh is installed via
# parallel.sharded.mesh_context, the commit/check pipelines annotate
# shardings — columns sharded for the per-column iNTT/zk-shift/LDE, one
# all-to-all reshard to row-sharded leaves for hashing and folding.  Ops
# are deterministic, so sharded and single-device proves emit identical
# seals.  One mesh per process: the jit cache keys on the `shard` static
# flag, not the mesh object.
_SHARD: dict = {"mesh": None, "cols_axis": None, "rows_axis": None}


def _constrain(x, spec_if_sharded):
    if _SHARD["mesh"] is None:
        return x
    from jax.sharding import NamedSharding

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_SHARD["mesh"], spec_if_sharded))


def _spec(*axes):
    from jax.sharding import PartitionSpec as P

    return P(*[_SHARD[a] if a else None for a in axes])


@partial(jax.jit, static_argnames=("shard",))
def _fold_tree_p2(leaves, shard: bool = False):
    """All Merkle fold layers above the leaves, one compiled graph
    (reference prove/merkle.rs:54-80).  Shared across every group with the
    same leaf count — ONE compile per po2 instead of one per group shape,
    which matters through the remote compile service."""
    if shard:
        leaves = _constrain(leaves, _spec("cols_axis", None))
    layers = []
    cur = leaves
    while cur.shape[0] > 1:
        cur = p2._hash_pairs_impl(cur[0::2], cur[1::2])
        layers.append(cur)
    return tuple(layers)


def _commit_pipeline_p2(witness, zk: bool = True, use_pallas: bool = False,
                        encode: bool = False):
    """Fused group commit (Poseidon2 suite): iNTT -> zk-shift -> 4x LDE ->
    leaf hashes in ONE compiled graph / ONE device dispatch, then the
    shared fold tree (the per-layer jit dispatches were ~20 compiles per
    group and dominated wall clock through the axon relay; folding inside
    the per-shape pipeline re-paid the fold compile once per group).

    Returns (coeffs_nat, evaluated, layers...) — layers[0] = leaf digests,
    layers[-1] = (1, 8) root.  Mirrors reference prove/prover.rs:38-48 +
    prove/merkle.rs:54-80 semantics.

    Large groups (the rv32im data group at po2>=19) take the
    column-chunked path: per-column NTT/LDE is exact under chunking, so
    the transient working set shrinks from O(whole-group LDE ping-pong)
    to O(chunk) — the difference between a po2=20 prove fitting in HBM
    and RESOURCE_EXHAUSTED.  The witness may stay a host np.ndarray, in
    which case chunks stream host->device inside the loop (overlapping
    transfer with NTT compute) instead of one bulk transfer.
    """
    shard = _SHARD["mesh"] is not None
    if not shard and _chunk_bytes(witness) > _CHUNK_THRESHOLD():
        return _commit_pipeline_chunked_p2(witness, zk=zk,
                                           use_pallas=use_pallas,
                                           encode=encode)
    if isinstance(witness, np.ndarray):
        witness = jnp.asarray(witness)
    coeffs_nat, evaluated, leaves = _commit_leaves_p2(
        witness, zk, use_pallas and not shard, shard=shard,
        pallas_ntt=_use_pallas_ntt(), encode=encode)
    return (coeffs_nat, evaluated, leaves) + _fold_tree_p2(leaves,
                                                           shard=shard)


def _chunk_bytes(witness) -> int:
    """Evaluated-domain footprint of the group in bytes (cols x 4rows)."""
    cols, rows = witness.shape
    return cols * rows * INV_RATE * 4


def _CHUNK_THRESHOLD() -> int:
    import os

    # 1 GiB: at po2=20 both the data AND accum groups stream column
    # chunks (A/B on chip r4: 63.4s -> 55.4s/prove; the bulk path's whole-
    # group LDE ping-pong loses to chunked transfer/compute overlap well
    # below the old 2 GiB HBM-pressure threshold)
    return int(os.environ.get("RISC0_TPU_COMMIT_CHUNK_BYTES",
                              str(1 << 30)))


@partial(jax.jit, static_argnames=("zk", "encode"), donate_argnums=(0,))
def _chunk_ntt_p2(chunk, zk: bool = True, encode: bool = False):
    """iNTT + zk-shift + 4x LDE for one column chunk (donated input)."""
    if encode:
        chunk = F.mul(chunk, jnp.uint32(F.R2))
    coeffs = ntt.interpolate_ntt(chunk)
    if zk:
        coeffs = ntt.zk_shift(coeffs)
    evaluated = ntt.evaluate_ntt(ntt.expand(coeffs, 2), 2)
    return ntt.bit_reverse(coeffs), evaluated


@partial(jax.jit, donate_argnums=(0,))
def _write_rows(buf, x, row):
    return jax.lax.dynamic_update_slice(buf, x, (row, jnp.int32(0)))


def _commit_pipeline_chunked_p2(witness, zk: bool = True,
                                use_pallas: bool = False,
                                encode: bool = False, chunk_cols: int = 32):
    cols, rows = witness.shape
    coeffs_nat = jnp.zeros((cols, rows), jnp.uint32)
    evaluated = jnp.zeros((cols, rows * INV_RATE), jnp.uint32)
    for c0 in range(0, cols, chunk_cols):
        c1 = min(c0 + chunk_cols, cols)
        if isinstance(witness, np.ndarray):
            chunk = jnp.asarray(np.ascontiguousarray(witness[c0:c1]))
        else:
            chunk = jnp.array(witness[c0:c1])  # copy => donatable
        cn, ev = _chunk_ntt_p2(chunk, zk=zk, encode=encode)
        coeffs_nat = _write_rows(coeffs_nat, cn, jnp.int32(c0))
        evaluated = _write_rows(evaluated, ev, jnp.int32(c0))
    if use_pallas:
        from .pallas import poseidon2 as pk

        leaves = pk.hash_rows(evaluated)
    else:
        leaves = _hash_rows_jit(evaluated)
    return (coeffs_nat, evaluated, leaves) + _fold_tree_p2(leaves,
                                                           shard=False)


@jax.jit
def _hash_rows_jit(evaluated):
    return p2._hash_rows_impl(evaluated)


def _use_pallas_ntt() -> bool:
    """Opt-in fused two-pass NTT (hal/pallas/ntt.py) — compiled backends
    only (CPU would need interpret mode; conformance is covered by
    tests/test_pallas_ntt.py in interpret mode)."""
    import os

    if os.environ.get("RISC0_TPU_PALLAS_NTT") != "1":
        return False
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


@partial(jax.jit, static_argnames=("zk", "use_pallas", "shard",
                                   "pallas_ntt", "encode"))
def _commit_leaves_p2(witness, zk: bool = True, use_pallas: bool = False,
                      shard: bool = False, pallas_ntt: bool = False,
                      encode: bool = False):
    if encode:
        # standard-form witness straight off the host witgen: Montgomery-
        # encode on device (mont_mul by R^2) instead of a host-side pass
        # over the full matrix before transfer
        witness = F.mul(witness, jnp.uint32(F.R2))
    if pallas_ntt and not shard:
        from .pallas import ntt as pntt

        coeffs = pntt.interpolate_ntt(witness)
        if zk:
            coeffs = ntt.zk_shift(coeffs)
        evaluated = pntt.evaluate_ntt(ntt.expand(coeffs, 2), 2)
        coeffs_nat = ntt.bit_reverse(coeffs)
        if use_pallas:
            from .pallas import poseidon2 as pk

            leaves = pk.hash_rows(evaluated)
        else:
            leaves = p2._hash_rows_impl(evaluated)
        return coeffs_nat, evaluated, leaves
    cols0 = witness.shape[0]
    if shard:
        # per-column iNTT/zk/LDE: columns sharded, rows local.  Pad the
        # column count to the axis size (zero columns NTT to zeros and
        # are sliced off before hashing — values unchanged).
        n_sh = _SHARD["mesh"].shape[_SHARD["cols_axis"]]
        padc = (-cols0) % n_sh
        if padc:
            witness = jnp.pad(witness, ((0, padc), (0, 0)))
        witness = _constrain(witness, _spec("cols_axis", None))
    coeffs = ntt.interpolate_ntt(witness)
    if zk:
        coeffs = ntt.zk_shift(coeffs)
    evaluated = ntt.evaluate_ntt(ntt.expand(coeffs, 2), 2)
    coeffs_nat = ntt.bit_reverse(coeffs)
    if shard:
        coeffs_nat = coeffs_nat[:cols0]
        # leaf hash needs every column of a row: one all-to-all reshard
        evaluated = _constrain(evaluated[:cols0], _spec(None, "cols_axis"))
    if use_pallas:
        from .pallas import poseidon2 as pk

        leaves = pk.hash_rows(evaluated)
    else:
        leaves = p2._hash_rows_impl(evaluated)
    return coeffs_nat, evaluated, leaves


def commit_pipeline(witness, suite_name: str = "poseidon2", zk: bool = True,
                    encode: bool = False):
    """Fused commit path; falls back to per-op calls for non-device suites.

    Returns (coeffs_nat, evaluated, layers_list).  encode=True takes a
    standard-form witness and Montgomery-encodes on device.
    """
    if suite_name == "poseidon2":
        rows4 = witness.shape[-1] * 4
        use_pallas = (p2._use_pallas() and rows4 >= 512 and rows4 % 512 == 0)
        out = _commit_pipeline_p2(witness, zk=zk, use_pallas=use_pallas,
                                  encode=encode)
        return out[0], out[1], list(out[2:])
    if encode:
        witness = jnp.asarray(F.encode_np(np.asarray(witness)))
    coeffs = make_coeffs(witness, zk_shift=zk)
    evaluated = expand_evaluate(coeffs, 2)
    coeffs_nat = ntt.bit_reverse(coeffs)
    return coeffs_nat, evaluated, merkle_layers(evaluated, suite_name)


@partial(jax.jit, static_argnames=("check_size", "use_pallas", "shard"))
def _check_pipeline_p2(check_poly, check_size: int = 16,
                       use_pallas: bool = False, shard: bool = False):
    """Fused check-group commit: iNTT the (4, domain) check polynomial,
    reinterpret the bit-reversed coeffs as `check_size` base polys with no
    data movement (reference prover.rs:159-178), then LDE + Merkle — ONE
    compiled graph (per-op dispatch through the axon relay costs ~10 ms/op;
    unfused this stage was ~150 dispatches, 20.5 s of a 38 s po2=18
    prove)."""
    cycles = check_poly.shape[-1] * check_poly.shape[0] // check_size
    coeffs_br = ntt.interpolate_ntt(check_poly).reshape(check_size, cycles)
    if shard:
        coeffs_br = _constrain(coeffs_br, _spec("cols_axis", None))
    evaluated = ntt.evaluate_ntt(ntt.expand(coeffs_br, 2), 2)
    coeffs_nat = ntt.bit_reverse(coeffs_br)
    if shard:
        evaluated = _constrain(evaluated, _spec(None, "cols_axis"))
    if use_pallas:
        from .pallas import poseidon2 as pk

        leaves = pk.hash_rows(evaluated)
    else:
        leaves = p2._hash_rows_impl(evaluated)
    return coeffs_nat, evaluated, leaves


def check_pipeline(check_poly, suite_name: str = "poseidon2",
                   check_size: int = 16):
    """Returns (coeffs_nat, evaluated, layers_list) for the check group."""
    if suite_name == "poseidon2":
        rows4 = check_poly.shape[-1]
        shard = _SHARD["mesh"] is not None
        use_pallas = (p2._use_pallas() and not shard and rows4 >= 512
                      and rows4 % 512 == 0)
        coeffs_nat, evaluated, leaves = _check_pipeline_p2(
            check_poly, check_size=check_size, use_pallas=use_pallas,
            shard=shard)
        return coeffs_nat, evaluated, [leaves] + list(
            _fold_tree_p2(leaves, shard=shard))
    coeffs = ntt.interpolate_ntt(check_poly)
    cycles = check_poly.shape[-1] // 4
    coeffs_br = coeffs.reshape(check_size, cycles)
    evaluated = expand_evaluate(coeffs_br, 2)
    coeffs_nat = ntt.bit_reverse(coeffs_br)
    return coeffs_nat, evaluated, merkle_layers(evaluated, suite_name)


def merkle_layers(matrix, suite_name: str = "poseidon2"):
    """Build all Merkle layers for a (cols, rows) matrix.

    Returns list of digest arrays: layers[0] = leaf hashes (rows, 8),
    layers[-1] = (1, 8) root.  Poseidon2 runs on device; the sha-256 suite
    uses the vectorized numpy path (device SHA kernels are a later round).
    """
    if suite_name == "poseidon2":
        leaves = p2.hash_rows(matrix)
        layers = [leaves]
        cur = leaves
        while cur.shape[0] > 1:
            cur = p2.hash_pairs(cur[0::2], cur[1::2])
            layers.append(cur)
        return layers
    if suite_name == "poseidon254":
        from ..hash import poseidon254 as p254

        leaves = p254.hash_rows(np.asarray(matrix))
        layers = [leaves]
        cur = leaves
        while cur.shape[0] > 1:
            cur = p254.hash_pairs(cur[0::2], cur[1::2])
            layers.append(cur)
        return layers
    if suite_name == "blake2b":
        from ..hash import blake2b as b2

        m = np.asarray(matrix)
        leaves = b2.hash_rows(m)
        layers = [leaves]
        cur = leaves
        while cur.shape[0] > 1:
            cur = b2.hash_pairs(cur[0::2], cur[1::2])
            layers.append(cur)
        return layers
    from ..hash import sha256 as sha

    m = np.asarray(matrix)
    leaves = sha.hash_rows_np(m)
    layers = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        cur = sha.hash_pairs_np(cur[0::2], cur[1::2])
        layers.append(cur)
    return layers
