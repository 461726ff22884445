"""Level-scheduled executor for extracted constraint IRs.

Tracing the rv32im constraint DAG op-by-op produces an XLA graph too large to
compile.  This module compiles the IR once on the host into a *batched plan*:

  1. scratch reads/writes resolve to SSA aliases (each scratch cell is written
     exactly once), duplicate tap/const reads dedupe;
  2. ops are levelized (longest-path depth) and grouped by opcode within a
     level, so each group executes as ONE vectorized gather -> op -> scatter
     over a (slots, tile) register file;
  3. register slots are assigned with a linear-scan allocator over the
     scheduled order, bounding live memory to max-live x tile.

The same plan then runs over domain chunks under `jax.jit` (graph size is
O(levels x opcode-groups), ~100x smaller than the flat trace) or with numpy
for host verification.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .. import field as F

# opcode aliases from the rv32im packing
(FCONST, FTAP, FGLOBAL, FSCR_RD, FADD, FSUB, FMUL, ECONST, EMADD, FSCR_WR,
 ESCR_WR, ESCR_RD, EADD, ESUB, EMUL, ESCALE, EADDF, FSUBE, ESUBF) = range(19)


@dataclass
class Plan:
    # inputs staged at chunk start
    tap_specs: list          # [(buf, col, back)] -> fp slot order
    tap_slots: np.ndarray
    const_vals: np.ndarray   # montgomery fp constants
    const_slots: np.ndarray
    global_specs: list       # [(buf, idx)]
    global_slots: np.ndarray
    econst_vals: np.ndarray  # (k, 4) montgomery
    econst_slots: np.ndarray
    # levels: list of {opcode: dict of operand arrays}
    levels: list = field(default_factory=list)
    n_fp_slots: int = 0
    n_ext_slots: int = 0
    ret_slot: int = 0


def dedup_ops(circuit):
    """Pass 1: scratch aliasing + dedup of taps/consts/globals.

    Returns (kept, ret_reg): `kept` is the list of (op, dst, operands...)
    with scratch reads/writes resolved to SSA aliases and duplicate
    tap/const/global reads deduplicated; `ret_reg` the final ext register.
    """
    ops, A = circuit.opcode, circuit.operands
    n = len(ops)

    # value ids: ('f', reg) / ('e', reg); alias maps resolve to canonical ids
    alias_f = {}
    alias_e = {}
    fscr_src = {}
    escr_src = {}

    def rf(r):
        while r in alias_f:
            r = alias_f[r]
        return r

    def re_(r):
        while r in alias_e:
            r = alias_e[r]
        return r

    tap_canon = {}
    const_canon = {}
    global_canon = {}
    econst_canon = {}

    kept = []  # (op, dst, operands...) with resolved regs
    for i in range(n):
        op = int(ops[i])
        a, b, c, d, e, f_ = (int(x) for x in A[i])
        if op == FCONST:
            if b in const_canon:
                alias_f[a] = const_canon[b]
            else:
                const_canon[b] = a
                kept.append((FCONST, a, b))
        elif op == FTAP:
            key = (b, c, d)
            if key in tap_canon:
                alias_f[a] = tap_canon[key]
            else:
                tap_canon[key] = a
                kept.append((FTAP, a, key))
        elif op == FGLOBAL:
            key = (b, c)
            if key in global_canon:
                alias_f[a] = global_canon[key]
            else:
                global_canon[key] = a
                kept.append((FGLOBAL, a, key))
        elif op == FSCR_RD:
            alias_f[a] = rf(fscr_src[b])
        elif op == FSCR_WR:
            fscr_src[a] = rf(b)
        elif op == ESCR_RD:
            alias_e[a] = re_(escr_src[b])
        elif op == ESCR_WR:
            escr_src[a] = re_(b)
        elif op == ECONST:
            key = (b, c, d, e)
            if key in econst_canon:
                alias_e[a] = econst_canon[key]
            else:
                econst_canon[key] = a
                kept.append((ECONST, a, key))
        elif op in (FADD, FSUB, FMUL):
            kept.append((op, a, rf(b), rf(c)))
        elif op in (EADD, ESUB, EMUL):
            kept.append((op, a, re_(b), re_(c)))
        elif op == ESCALE or op == EADDF:
            kept.append((op, a, re_(b), rf(c)))
        elif op == FSUBE:
            kept.append((op, a, rf(b), re_(c)))
        elif op == ESUBF:
            kept.append((op, a, re_(b), rf(c)))
        elif op == EMADD:
            ffs = tuple(rf(x) for x in (d, e) if x >= 0)
            ef = re_(f_) if f_ >= 0 else -1
            kept.append((EMADD, a, re_(b), c, ffs, ef))
        else:
            raise ValueError(f"bad opcode {op}")

    return kept, re_(circuit.ret[1])


def deps_of_item(item):
    """(fp_deps, ext_deps) of a dedup'd op."""
    op = item[0]
    if op in (FCONST, FTAP, FGLOBAL, ECONST):
        return (), ()
    if op in (FADD, FSUB, FMUL):
        return (item[2], item[3]), ()
    if op in (EADD, ESUB, EMUL):
        return (), (item[2], item[3])
    if op in (ESCALE, EADDF):
        return (item[3],), (item[2],)
    if op == FSUBE:
        return (item[2],), (item[3],)
    if op == ESUBF:
        return (item[3],), (item[2],)
    if op == EMADD:
        fdeps = item[4]
        edeps = (item[2],) + ((item[5],) if item[5] >= 0 else ())
        return fdeps, edeps
    raise AssertionError


def build_plan(circuit) -> Plan:
    kept, ret_reg = dedup_ops(circuit)

    # ---- pass 2: levelize -------------------------------------------------
    level_f = {}
    level_e = {}
    deps_of = deps_of_item

    op_level = []
    for item in kept:
        fdeps, edeps = deps_of(item)
        lvl = 0
        for r in fdeps:
            lvl = max(lvl, level_f[r] + 1)
        for r in edeps:
            lvl = max(lvl, level_e[r] + 1)
        op_level.append(lvl)
        dst = item[1]
        if item[0] in (FCONST, FTAP, FGLOBAL, FADD, FSUB, FMUL):
            level_f[dst] = lvl
        else:
            level_e[dst] = lvl

    # ---- pass 3: slot allocation over scheduled (level) order -------------
    order = sorted(range(len(kept)), key=lambda i: op_level[i])
    # last-use LEVEL per register (slots are only recycled at level
    # boundaries so groups within one level can execute in any order)
    last_level_f = {}
    last_level_e = {}
    for idx in order:
        fdeps, edeps = deps_of(kept[idx])
        for r in fdeps:
            last_level_f[r] = max(last_level_f.get(r, 0), op_level[idx])
        for r in edeps:
            last_level_e[r] = max(last_level_e.get(r, 0), op_level[idx])
    max_level = max(op_level) if op_level else 0
    last_level_e[ret_reg] = max_level + 1

    slot_f, slot_e = {}, {}
    free_f, free_e = [], []
    n_f_slots = n_e_slots = 0
    expire_f = {}
    expire_e = {}

    def alloc_f(reg, lvl):
        nonlocal n_f_slots
        s = free_f.pop() if free_f else (n_f_slots := n_f_slots + 1) - 1
        slot_f[reg] = s
        expire_f.setdefault(last_level_f.get(reg, lvl), []).append(s)
        return s

    def alloc_e(reg, lvl):
        nonlocal n_e_slots
        s = free_e.pop() if free_e else (n_e_slots := n_e_slots + 1) - 1
        slot_e[reg] = s
        expire_e.setdefault(last_level_e.get(reg, lvl), []).append(s)
        return s

    levels = []
    groups = {}
    cur_level = 0

    def flush_level():
        nonlocal groups
        if groups:
            levels.append(groups)
        groups = {}

    for idx in order:
        item = kept[idx]
        op, dst = item[0], item[1]
        lvl = op_level[idx]
        if lvl != cur_level:
            flush_level()
            # recycle slots whose last use is strictly before this level
            for l in range(cur_level, lvl):
                free_f.extend(expire_f.pop(l, ()))
                free_e.extend(expire_e.pop(l, ()))
            cur_level = lvl

        if op == FCONST:
            groups.setdefault("fconst", []).append((alloc_f(dst, lvl), item[2]))
        elif op == FTAP:
            groups.setdefault("ftap", []).append((alloc_f(dst, lvl), item[2]))
        elif op == FGLOBAL:
            groups.setdefault("fglobal", []).append((alloc_f(dst, lvl), item[2]))
        elif op == ECONST:
            groups.setdefault("econst", []).append((alloc_e(dst, lvl), item[2]))
        elif op in (FADD, FSUB, FMUL):
            sa, sb = slot_f[item[2]], slot_f[item[3]]
            key = {FADD: "fadd", FSUB: "fsub", FMUL: "fmul"}[op]
            groups.setdefault(key, []).append((alloc_f(dst, lvl), sa, sb))
        elif op in (EADD, ESUB, EMUL):
            sa, sb = slot_e[item[2]], slot_e[item[3]]
            key = {EADD: "eadd", ESUB: "esub", EMUL: "emul"}[op]
            groups.setdefault(key, []).append((alloc_e(dst, lvl), sa, sb))
        elif op in (ESCALE, EADDF):
            se, sf = slot_e[item[2]], slot_f[item[3]]
            key = "escale" if op == ESCALE else "eaddf"
            groups.setdefault(key, []).append((alloc_e(dst, lvl), se, sf))
        elif op == FSUBE:
            sf, se = slot_f[item[2]], slot_e[item[3]]
            groups.setdefault("fsube", []).append((alloc_e(dst, lvl), sf, se))
        elif op == ESUBF:
            se, sf = slot_e[item[2]], slot_f[item[3]]
            groups.setdefault("esubf", []).append((alloc_e(dst, lvl), se, sf))
        elif op == EMADD:
            acc = slot_e[item[2]]
            k = item[3]
            ffs = tuple(slot_f[r] for r in item[4])
            ef = slot_e[item[5]] if item[5] >= 0 else -1
            sig = (len(ffs), ef >= 0)
            groups.setdefault(("emadd", sig), []).append(
                (alloc_e(dst, lvl), acc, k) + ffs + ((ef,) if ef >= 0 else ()))
    flush_level()

    # split out staged inputs (consts/taps/globals) before array conversion
    plan = Plan([], None, [], None, [], None, [], None)
    tap_slots, const_slots, global_slots, econst_slots = [], [], [], []
    packed_levels = []
    for g in levels:
        for key in ("fconst", "ftap", "fglobal", "econst"):
            for s, spec in g.pop(key, ()):
                if key == "fconst":
                    const_slots.append(s)
                    plan.const_vals.append(F.s_encode(int(spec)))
                elif key == "ftap":
                    tap_slots.append(s)
                    plan.tap_specs.append(tuple(int(x) for x in spec))
                elif key == "fglobal":
                    global_slots.append(s)
                    plan.global_specs.append(tuple(int(x) for x in spec))
                else:
                    econst_slots.append(s)
                    plan.econst_vals.append(
                        F.encode_np(np.array(spec, np.uint32)))
        if g:
            packed_levels.append(
                {k: np.array(v, np.int64) for k, v in g.items()})

    plan.levels = packed_levels
    plan.tap_slots = np.array(tap_slots, np.int64)
    plan.const_slots = np.array(const_slots, np.int64)
    plan.const_vals = np.array(plan.const_vals, np.uint32)
    plan.global_slots = np.array(global_slots, np.int64)
    plan.econst_slots = np.array(econst_slots, np.int64)
    plan.econst_vals = (np.stack(plan.econst_vals)
                        if len(plan.econst_vals) else np.zeros((0, 4), np.uint32))
    plan.n_fp_slots = n_f_slots
    plan.n_ext_slots = n_e_slots
    plan.ret_slot = slot_e[ret_reg]
    return plan


# ---------------------------------------------------------------------------
# Execution
# ---------------------------------------------------------------------------

def _group_rows(arr):
    return [tuple(int(x) for x in row) for row in arr]


def execute_plan_np(plan: Plan, tap_matrix, global_vals, pm_pows):
    """numpy execution over a (n_taps, T) tap matrix; returns (T, 4)."""
    T = tap_matrix.shape[1]
    fp = np.zeros((plan.n_fp_slots, T), np.uint32)
    ext = np.zeros((plan.n_ext_slots, T, 4), np.uint32)
    fp[plan.const_slots] = plan.const_vals[:, None]
    fp[plan.tap_slots] = tap_matrix
    fp[plan.global_slots] = np.asarray(global_vals, np.uint32)[:, None]
    if len(plan.econst_slots):
        ext[plan.econst_slots] = plan.econst_vals[:, None, :]

    ea, es, em = F.add_np, F.sub_np, F.ext_mul_np
    fm = F.mul_np
    for g in plan.levels:
        for key, rows in g.items():
            if key == "fadd":
                fp[rows[:, 0]] = ea(fp[rows[:, 1]], fp[rows[:, 2]])
            elif key == "fsub":
                fp[rows[:, 0]] = es(fp[rows[:, 1]], fp[rows[:, 2]])
            elif key == "fmul":
                fp[rows[:, 0]] = fm(fp[rows[:, 1]], fp[rows[:, 2]])
            elif key == "eadd":
                ext[rows[:, 0]] = ea(ext[rows[:, 1]], ext[rows[:, 2]])
            elif key == "esub":
                ext[rows[:, 0]] = es(ext[rows[:, 1]], ext[rows[:, 2]])
            elif key == "emul":
                ext[rows[:, 0]] = em(ext[rows[:, 1]], ext[rows[:, 2]])
            elif key == "escale":
                ext[rows[:, 0]] = fm(ext[rows[:, 1]], fp[rows[:, 2]][:, :, None])
            elif key == "eaddf":
                t = ext[rows[:, 1]].copy()
                t[:, :, 0] = ea(t[:, :, 0], fp[rows[:, 2]])
                ext[rows[:, 0]] = t
            elif key == "fsube":
                fe = np.zeros((len(rows), T, 4), np.uint32)
                fe[:, :, 0] = fp[rows[:, 1]]
                ext[rows[:, 0]] = es(fe, ext[rows[:, 2]])
            elif key == "esubf":
                fe = np.zeros((len(rows), T, 4), np.uint32)
                fe[:, :, 0] = fp[rows[:, 2]]
                ext[rows[:, 0]] = es(ext[rows[:, 1]], fe)
            elif isinstance(key, tuple) and key[0] == "emadd":
                nf, has_e = key[1]
                term = np.broadcast_to(
                    pm_pows[rows[:, 2]][:, None, :], (len(rows), T, 4)).copy()
                col = 3
                for _ in range(nf):
                    term = fm(term, fp[rows[:, col]][:, :, None])
                    col += 1
                if has_e:
                    term = em(term, ext[rows[:, col]])
                ext[rows[:, 0]] = ea(ext[rows[:, 1]], term)
            else:
                raise ValueError(f"bad group {key}")
    return ext[plan.ret_slot]


def execute_plan_jnp(plan: Plan, tap_matrix, global_vals, pm_pows):
    """jnp execution (jit-compatible); same semantics as execute_plan_np."""
    import jax.numpy as jnp

    T = tap_matrix.shape[1]
    fp = jnp.zeros((plan.n_fp_slots, T), jnp.uint32)
    ext = jnp.zeros((plan.n_ext_slots, T, 4), jnp.uint32)
    fp = fp.at[plan.const_slots].set(jnp.asarray(plan.const_vals)[:, None])
    fp = fp.at[plan.tap_slots].set(tap_matrix)
    fp = fp.at[plan.global_slots].set(global_vals[:, None])
    if len(plan.econst_slots):
        ext = ext.at[plan.econst_slots].set(
            jnp.asarray(plan.econst_vals)[:, None, :])

    for g in plan.levels:
        for key, rows in g.items():
            r0, r1 = rows[:, 0], rows[:, 1]
            if key in ("fadd", "fsub", "fmul"):
                fn = {"fadd": F.add, "fsub": F.sub, "fmul": F.mul}[key]
                fp = fp.at[r0].set(fn(fp[r1], fp[rows[:, 2]]))
            elif key in ("eadd", "esub"):
                fn = F.add if key == "eadd" else F.sub
                ext = ext.at[r0].set(fn(ext[r1], ext[rows[:, 2]]))
            elif key == "emul":
                ext = ext.at[r0].set(F.ext_mul(ext[r1], ext[rows[:, 2]]))
            elif key == "escale":
                ext = ext.at[r0].set(F.mul(ext[r1], fp[rows[:, 2]][:, :, None]))
            elif key == "eaddf":
                t = ext[r1]
                t = t.at[:, :, 0].set(F.add(t[:, :, 0], fp[rows[:, 2]]))
                ext = ext.at[r0].set(t)
            elif key == "fsube":
                fe = jnp.zeros((rows.shape[0], T, 4), jnp.uint32)
                fe = fe.at[:, :, 0].set(fp[r1])
                ext = ext.at[r0].set(F.sub(fe, ext[rows[:, 2]]))
            elif key == "esubf":
                fe = jnp.zeros((rows.shape[0], T, 4), jnp.uint32)
                fe = fe.at[:, :, 0].set(fp[rows[:, 2]])
                ext = ext.at[r0].set(F.sub(ext[r1], fe))
            elif isinstance(key, tuple) and key[0] == "emadd":
                nf, has_e = key[1]
                term = jnp.broadcast_to(
                    pm_pows[rows[:, 2]][:, None, :], (rows.shape[0], T, 4))
                col = 3
                for _ in range(nf):
                    term = F.mul(term, fp[rows[:, col]][:, :, None])
                    col += 1
                if has_e:
                    term = F.ext_mul(term, ext[rows[:, col]])
                ext = ext.at[r0].set(F.add(ext[r1], term))
            else:
                raise ValueError(f"bad group {key}")
    return ext[plan.ret_slot]


def build_tap_matrix_np(plan: Plan, bufs, start: int, T: int, domain: int):
    """Gather the (n_taps, T) tap inputs for domain rows [start, start+T)."""
    idx = (np.arange(start, start + T)[None, :]) % domain
    out = np.zeros((len(plan.tap_specs), T), np.uint32)
    for i, (buf, col, back) in enumerate(plan.tap_specs):
        rows = (np.arange(start - 4 * back, start - 4 * back + T)) % domain
        out[i] = np.asarray(bufs[buf][col])[rows]
    return out


def make_plan_runner(plan: Plan):
    """Jitted device evaluator: tap gather + plan execution in one XLA
    computation.  `start` is traced, so one compile covers every chunk of
    the domain; T and domain are static."""
    import functools

    import jax
    import jax.numpy as jnp

    specs = np.array(plan.tap_specs, np.int64)  # (n, 3): buf, col, back
    a_mask = specs[:, 0] == 0
    a_pos = jnp.asarray(np.nonzero(a_mask)[0])
    d_pos = jnp.asarray(np.nonzero(~a_mask)[0])
    a_cols = jnp.asarray(specs[a_mask, 1])
    a_backs = jnp.asarray(specs[a_mask, 2])
    d_cols = jnp.asarray(specs[~a_mask, 1])
    d_backs = jnp.asarray(specs[~a_mask, 2])
    n_taps = len(specs)

    @functools.partial(jax.jit, static_argnums=(5, 6))
    def run(accum, data, gvals, pm_pows, start, T, domain):
        ar = jnp.arange(T, dtype=jnp.int32)
        tapm = jnp.zeros((n_taps, T), jnp.uint32)
        ia = (start - 4 * a_backs[:, None] + ar[None, :]) % domain
        tapm = tapm.at[a_pos].set(accum[a_cols[:, None], ia])
        idx = (start - 4 * d_backs[:, None] + ar[None, :]) % domain
        tapm = tapm.at[d_pos].set(data[d_cols[:, None], idx])
        return execute_plan_jnp(plan, tapm, gvals, pm_pows)

    return run
