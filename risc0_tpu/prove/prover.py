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
                       suite_name: str = "poseidon2", zk: bool = True):
        """Build a PolyGroup from a (count, cycles) witness via the fused
        single-dispatch commit pipeline (iNTT+zk-shift+LDE+Merkle in one
        jit)."""
        return PolyGroup(_from_pipeline=hal.commit_pipeline(
            witness, suite_name, zk=zk), queries=queries,
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

    def commit_group(self, group_id: int, witness):
        """witness: device (group_size, cycles) uint32 Montgomery."""
        count, size = witness.shape
        assert size == self.cycles
        assert count == self.taps.group_size(group_id)
        assert self.groups[group_id] is None
        with perf.scope(f"commit_group.{group_id}"):
            pg = PolyGroup.commit_witness(witness, suite_name=self.suite.name)
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
            all_xs = []
            group_ids, cols, backs = [], [], []
            for gid in range(taps.num_groups):
                for offset, back in taps.group_taps(gid):
                    group_ids.append(gid)
                    cols.append(offset)
                    backs.append(back)
                    all_xs.append(F.ext_mul_np(_base_pow_ext(back_one, back), z))
            ub = sorted(set(backs))
            xs_distinct = np.stack(
                [F.ext_mul_np(_base_pow_ext(back_one, b), z) for b in ub])
            back_idx = [ub.index(b) for b in backs]
        with perf.scope("tap_device"):
            eval_u = list(np.asarray(hal.evaluate_tap_groups(
                [self.groups[g].coeffs for g in range(taps.num_groups)],
                group_ids, cols, backs, xs_distinct, back_idx)))

        # interpolate each register's taps to coefficients
        with perf.scope("tap_interp"):
            coeff_u = []
            pos = 0
            for reg in taps.regs:
                sz = reg.size
                out = poly.poly_interpolate(
                    np.stack(all_xs[pos : pos + sz]),
                    np.stack(eval_u[pos : pos + sz]))
                coeff_u.extend(out)
                pos += sz

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

        # mix the committed coefficients into combos (prover.rs:278-318)
        with perf.scope("combos_mix"):
            cur_mix = poly.ext_one()
            for gid in range(taps.num_groups):
                pg = self.groups[gid]
                regs = taps.group_regs(gid)
                group_size = taps.group_size(gid)
                assert len(regs) == group_size, "register groups must be dense"
                which = np.array([r.combo_id for r in regs])
                mix_pows = np.zeros((group_size, 4), np.uint32)
                cm = cur_mix
                for i in range(group_size):
                    mix_pows[i] = cm
                    cm = F.ext_mul_np(cm, mix)
                combos = hal.mix_poly_coeffs(
                    combos, jnp.asarray(mix_pows), pg.coeffs, which,
                    combo_count)
                cur_mix = F.ext_mul_np(cur_mix, F.ext_pow_np(mix, group_size))

            which = np.full(CHECK_SIZE, combo_count)
            mix_pows = np.zeros((CHECK_SIZE, 4), np.uint32)
            cm = cur_mix
            for i in range(CHECK_SIZE):
                mix_pows[i] = cm
                cm = F.ext_mul_np(cm, mix)
            combos = hal.mix_poly_coeffs(
                combos, jnp.asarray(mix_pows), check_group.coeffs, which,
                combo_count)

        # combos_prepare: subtract claimed opening polys (hal/mod.rs:202-234).
        # Only coefficients [0, max_reg_size) of each combo are touched, so
        # build the tiny correction block host-side and subtract it on
        # device — no full-array host roundtrip (r2: np.array(combos) pulled
        # 5 x cycles x 16B back per prove).
        with perf.scope("combos_prepare"):
            max_size = max([reg.size for reg in taps.regs] + [1])
            corr = np.zeros((combo_count + 1, max_size, 4), np.uint32)
            cur = poly.ext_one()
            cur_pos = 0
            for reg in taps.regs:
                for i in range(reg.size):
                    corr[reg.combo_id, i] = F.add_np(
                        corr[reg.combo_id, i],
                        F.ext_mul_np(cur, coeff_u[cur_pos + i]))
                cur = F.ext_mul_np(cur, mix)
                cur_pos += reg.size
            for _ in range(CHECK_SIZE):
                corr[combo_count, 0] = F.add_np(
                    corr[combo_count, 0],
                    F.ext_mul_np(cur, coeff_u[cur_pos]))
                cur_pos += 1
                cur = F.ext_mul_np(cur, mix)
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


def _base_pow_ext(base_mont: int, e: int) -> np.ndarray:
    """(base^e) as an ext element, base a Montgomery-form int."""
    out = np.zeros(4, np.uint32)
    out[0] = F.s_pow(base_mont, e)
    return out
