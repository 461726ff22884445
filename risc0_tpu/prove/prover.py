"""Generic DEEP-ALI/FRI STARK prover (reference: risc0/zkp/src/prove/prover.rs).

The IOP orchestration runs on host; every bulk polynomial/hash op runs on
device through the HAL.  Seals are bit-compatible with the reference protocol
(see SURVEY.md Appendix A).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import field as F
from .. import perf
from ..core import ntt, poly
from ..hal import jnp_hal as hal
from .fri import fri_prove
from .merkle import MerkleTreeProver
from .write_iop import WriteIOP

INV_RATE = 4
EXT_SIZE = 4
CHECK_SIZE = INV_RATE * EXT_SIZE
QUERIES = 50


class PolyGroup:
    """Committed group (reference: risc0/zkp/src/prove/poly_group.rs).

    coeffs arrive bit-reversed; stored natural-order after LDE + merkle build.
    """

    def __init__(self, coeffs_br=None, queries: int = QUERIES,
                 suite_name: str = "poseidon2", _from_pipeline=None):
        if _from_pipeline is not None:
            coeffs_nat, evaluated, layers = _from_pipeline
            self.count, self.size = coeffs_nat.shape
            self.evaluated = evaluated
            self.coeffs = coeffs_nat
            self.merkle = MerkleTreeProver(
                evaluated, queries, suite_name, layers=layers)
            return
        self.count, self.size = coeffs_br.shape
        self.evaluated = hal.expand_evaluate(coeffs_br, 2)  # (count, 4*size)
        self.coeffs = ntt.bit_reverse(coeffs_br)            # natural order
        self.merkle = MerkleTreeProver(self.evaluated, queries, suite_name)

    @staticmethod
    def commit_witness(witness, queries: int = QUERIES,
                       suite_name: str = "poseidon2", zk: bool = True,
                       encode: bool = False):
        """Build a PolyGroup from a (count, cycles) witness via the fused
        single-dispatch commit pipeline (iNTT+zk-shift+LDE+Merkle in one
        jit).  encode=True accepts standard-form values and Montgomery-
        encodes on device (skips a host pass over the full matrix)."""
        return PolyGroup(_from_pipeline=hal.commit_pipeline(
            witness, suite_name, zk=zk, encode=encode), queries=queries,
            suite_name=suite_name)


class Prover:
    def __init__(self, suite, taps):
        self.suite = suite
        self.taps = taps
        self.iop = WriteIOP(suite)
        self.groups = [None] * taps.num_groups
        self.po2 = None
        self.cycles = 0

    def set_po2(self, po2: int):
        assert self.po2 is None
        self.po2 = po2
        self.cycles = 1 << po2

    def commit_group(self, group_id: int, witness, encode: bool = False):
        """witness: device (group_size, cycles) uint32 — Montgomery form,
        or standard form with encode=True (encoded on device)."""
        count, size = witness.shape
        assert size == self.cycles
        assert count == self.taps.group_size(group_id)
        assert self.groups[group_id] is None
        with perf.scope(f"commit_group.{group_id}"):
            pg = PolyGroup.commit_witness(witness, suite_name=self.suite.name,
                                          encode=encode)
            self.groups[group_id] = pg
            pg.merkle.commit(self.iop)   # root readback syncs the pipeline
        return pg

    def finalize(self, globals_list, circuit_hal):
        """globals_list: list of host uint32 arrays (out, mix, ...) passed to
        eval_check; circuit_hal.eval_check(groups, globals, poly_mix, po2) must
        return the (4, domain) check polynomial."""
        taps = self.taps
        iop = self.iop
        poly_mix = iop.random_ext_elem()
        domain = self.cycles * INV_RATE

        with perf.scope("eval_check"):
            check_poly = circuit_hal.eval_check(
                [pg.evaluated for pg in self.groups], globals_list,
                poly_mix, self.po2,
            )
            assert check_poly.shape == (EXT_SIZE, domain)
            # force a 4-byte readback so the scope covers the real device
            # time instead of letting the async wait land in check_commit
            # (block_until_ready is unreliable through the axon relay)
            if not isinstance(check_poly, np.ndarray):
                np.asarray(check_poly[0:1, 0:1])

        # interpolate the 4 planar polys; bit-reversed coeffs reinterpret as
        # 16 polys of length cycles with no data movement (prover.rs:143-178);
        # iNTT + reshape + LDE + Merkle fused in one compiled graph
        with perf.scope("check_commit"):
            check_group = PolyGroup(
                _from_pipeline=hal.check_pipeline(
                    check_poly, self.suite.name, CHECK_SIZE),
                suite_name=self.suite.name)
            check_group.merkle.commit(iop)

        # DEEP query point
        z = iop.random_ext_elem()  # (4,) host
        back_one = F.s_encode(F.ROU_REV[self.po2])

        # Evaluate taps at z * back_one^back, group order accum/code/data —
        # ONE fused device dispatch over all groups (hal.evaluate_tap_groups)
        perf_tap = perf.scope("tap_eval"); perf_tap.__enter__()
        with perf.scope("tap_xs"):
            group_ids, cols, backs = [], [], []
            for gid in range(taps.num_groups):
                for offset, back in taps.group_taps(gid):
                    group_ids.append(gid)
                    cols.append(offset)
                    backs.append(back)
            ub = sorted(set(backs))
            xs_distinct = np.stack(
                [F.ext_mul_np(_base_pow_ext(back_one, b), z) for b in ub])
            back_idx = [ub.index(b) for b in backs]
        with perf.scope("tap_device"):
            eval_u = np.asarray(hal.evaluate_tap_groups(
                [self.groups[g].coeffs for g in range(taps.num_groups)],
                group_ids, cols, backs, xs_distinct, back_idx))

        # Interpolate each register's taps to coefficients.  Lagrange
        # interpolation at fixed nodes is a LINEAR map, and every register
        # in a combo shares the same nodes (xs = z*back_one^back for the
        # combo's back-set) — so build one small basis matrix per combo and
        # apply it to all member registers in a batched ext contraction
        # (r3 profile: the per-register scalar loop was 8.9s/prove).
        with perf.scope("tap_interp"):
            sizes = np.array([r.size for r in taps.regs])
            offs = np.concatenate([[0], np.cumsum(sizes)])
            coeff_u = np.zeros((int(offs[-1]), 4), np.uint32)
            z_inv = F.ext_inv_np(z)
            for cid, combo_backs in enumerate(taps.combos):
                ridx = [i for i, r in enumerate(taps.regs)
                        if r.combo_id == cid]
                if not ridx:
                    continue
                s = len(combo_backs)
                # Interpolation nodes are z*back_one^back: the Lagrange
                # basis at the CONSTANT nodes back_one^back is cached per
                # (po2, combo), and the per-prove basis is just coefficient
                # j scaled by z^-j (P(x) = sum_i f_i Lhat_i(x/z)).
                basis_c = _lagrange_basis_cached(self.po2, back_one,
                                                 combo_backs)
                zinv_pows = F.ext_powers_np(z_inv, s)  # (s, 4)
                basis = F.mul_np(  # (s, s, 4): base basis * ext z^-j
                    np.broadcast_to(basis_c[:, :, None], (s, s, 4)),
                    zinv_pows[None, :, :])
                ev = np.stack([eval_u[offs[i] : offs[i] + s] for i in ridx])
                # out[r, j] = sum_i ev[r, i] * basis[i, j]
                prod = F.ext_mul_np(ev[:, :, None, :], basis[None])
                out = prod[:, 0]
                for i in range(1, s):
                    out = F.add_np(out, prod[:, i])
                for k, i in enumerate(ridx):
                    coeff_u[offs[i] : offs[i] + s] = out[k]
            coeff_u = list(coeff_u)

        # add check-poly openings at z^4
        with perf.scope("tap_check_eval"):
            z_pow = F.ext_pow_np(z, EXT_SIZE)
            which = np.arange(CHECK_SIZE)
            xs = jnp.asarray(np.broadcast_to(z_pow, (CHECK_SIZE, 4)).copy())
            check_u = np.asarray(
                hal.batch_evaluate_any(check_group.coeffs, which, xs))
            coeff_u.extend(check_u)

        with perf.scope("tap_commit"):
            coeff_u = np.stack(coeff_u)  # (num_taps + CHECK_SIZE, 4)
            iop.write_field_elems(coeff_u)
            iop.commit(self.suite.hash_elem_slice(coeff_u.ravel()))
        perf_tap.__exit__(None, None, None)

        # FRI batching mix
        mix = iop.random_ext_elem()
        perf_cmb = perf.scope("combos"); perf_cmb.__enter__()

        combo_count = taps.combos_size
        combos = jnp.zeros((combo_count + 1, self.cycles, 4), jnp.uint32)

        # mix the committed coefficients into combos (prover.rs:278-318);
        # one doubling-built power table covers all groups + the check row
        with perf.scope("combos_mix"):
            total = sum(taps.group_size(g) for g in range(taps.num_groups))
            pow_table = F.ext_powers_np(mix, total + CHECK_SIZE)
            base = 0
            for gid in range(taps.num_groups):
                pg = self.groups[gid]
                regs = taps.group_regs(gid)
                group_size = taps.group_size(gid)
                assert len(regs) == group_size, "register groups must be dense"
                which = np.array([r.combo_id for r in regs])
                combos = hal.mix_poly_coeffs(
                    combos, jnp.asarray(pow_table[base : base + group_size]),
                    pg.coeffs, which, combo_count)
                base += group_size

            which = np.full(CHECK_SIZE, combo_count)
            combos = hal.mix_poly_coeffs(
                combos, jnp.asarray(pow_table[base : base + CHECK_SIZE]),
                check_group.coeffs, which, combo_count)

        # combos_prepare: subtract claimed opening polys (hal/mod.rs:202-234).
        # Only coefficients [0, max_reg_size) of each combo are touched, so
        # build the tiny correction block host-side and subtract it on
        # device — no full-array host roundtrip (r2: np.array(combos) pulled
        # 5 x cycles x 16B back per prove).
        with perf.scope("combos_prepare"):
            max_size = max([reg.size for reg in taps.regs] + [1])
            n_regs = len(taps.regs)
            # per-tap mix power: mix^(reg index), check taps continue the
            # sequence one power per tap
            reg_pows = F.ext_powers_np(mix, n_regs + CHECK_SIZE)
            tap_pows = np.repeat(reg_pows[:n_regs], sizes, axis=0)
            tap_pows = np.concatenate([tap_pows, reg_pows[n_regs:]])
            terms = F.ext_mul_np(tap_pows, np.stack(coeff_u))
            # scatter-add into (combo, coeff-slot) cells: u64 partial sums
            # stay < 2^41 for <=2^10 terms, one mod at the end
            corr64 = np.zeros((combo_count + 1, max_size, 4), np.uint64)
            slot_c = np.concatenate(
                [np.repeat([r.combo_id for r in taps.regs], sizes),
                 np.full(CHECK_SIZE, combo_count)])
            slot_i = np.concatenate(
                [np.concatenate([np.arange(r.size) for r in taps.regs]),
                 np.zeros(CHECK_SIZE, int)])
            np.add.at(corr64, (slot_c, slot_i), terms.astype(np.uint64))
            corr = (corr64 % np.uint64(F.P)).astype(np.uint32)
            combos = hal.combos_subtract_head(combos, jnp.asarray(corr))

        # combos_divide: exact division by each (x - z*back_one^back), all
        # combos per level batched into one device dispatch + one readback
        with perf.scope("combos_divide"):
            n_levels = max(len(b) for b in taps.combos)
            m = combo_count + 1
            zs_levels = np.zeros((n_levels, m, 4), np.uint32)
            zs_levels[:, :, 0] = F.R % F.P  # ONE for inactive rows
            active = np.zeros((n_levels, m), bool)
            for c in range(combo_count):
                for lvl, back in enumerate(taps.combos[c]):
                    zs_levels[lvl, c] = F.ext_mul_np(
                        z, _base_pow_ext(back_one, back))
                    active[lvl, c] = True
            combos, rems = hal.combos_divide(
                combos, jnp.asarray(zs_levels), jnp.asarray(active),
                jnp.asarray(z_pow))
            assert not np.any(np.asarray(rems)), "combo remainder != 0"

        # sum combos into the final FRI polynomial, planar + bit-reversed
        with perf.scope("combos_sum"):
            final_coeffs = hal.eltwise_sum_extelem(combos)  # (4, cycles)
            final_coeffs = ntt.bit_reverse(final_coeffs)
        perf_cmb.__exit__(None, None, None)

        def inner(positions):
            prefetched = [pg.merkle.prefetch(positions) for pg in self.groups]
            prefetched.append(check_group.merkle.prefetch(positions))

            def write(iop_, qi):
                for pf in prefetched:
                    pf.write(iop_, qi)

            return write

        with perf.scope("fri_prove"):
            fri_prove(iop, final_coeffs, inner)

        from . import soundness
        with perf.scope("soundness"):
            self.soundness = {
                "proven": soundness.proven(taps, self.cycles * EXT_SIZE),
                "conjectured": soundness.toy_model_security(
                    taps, self.cycles * EXT_SIZE),
            }
        return iop.proof


_BASIS_CACHE: dict = {}


def _lagrange_basis_cached(po2: int, back_one: int, combo_backs) -> np.ndarray:
    """Lagrange basis matrix at the base-field nodes back_one^back:
    out[i, j] = coefficient j of the poly that is 1 at node i, 0 at the
    others (Montgomery u32, shape (s, s)).  Depends only on (po2, backs),
    so it is computed once with scalar ops and cached; per-prove bases at
    z*nodes are recovered by scaling coefficient j with z^-j."""
    key = (po2, tuple(combo_backs))
    hit = _BASIS_CACHE.get(key)
    if hit is not None:
        return hit
    s = len(combo_backs)
    one = F.R % F.P
    nodes = [F.s_pow(back_one, b) for b in combo_backs]
    # ft = prod_i (x - nodes[i]), degree s
    ft = [one] + [0] * s
    for i in range(s):
        nxt = [0] * (s + 1)
        for j in range(s):
            nxt[j + 1] = F.s_add(nxt[j + 1], ft[j])
            nxt[j] = F.s_add(nxt[j], F.s_mul(ft[j], F.P - nodes[i]
                                             if nodes[i] else 0))
        ft = nxt
    out = np.zeros((s, s), np.uint32)
    for i in range(s):
        # fr = ft / (x - nodes[i]) by synthetic division (exact)
        fr = [0] * s
        cur = ft[s]
        for j in range(s - 1, -1, -1):
            fr[j] = cur
            cur = F.s_add(ft[j], F.s_mul(nodes[i], cur))
        denom = 0
        xp = one
        for j in range(s):
            denom = F.s_add(denom, F.s_mul(fr[j], xp))
            xp = F.s_mul(xp, nodes[i])
        dinv = F.s_inv(denom)
        out[i] = [F.s_mul(fr[j], dinv) for j in range(s)]
    _BASIS_CACHE[key] = out
    return out


def _base_pow_ext(base_mont: int, e: int) -> np.ndarray:
    """(base^e) as an ext element, base a Montgomery-form int."""
    out = np.zeros(4, np.uint32)
    out[0] = F.s_pow(base_mont, e)
    return out
