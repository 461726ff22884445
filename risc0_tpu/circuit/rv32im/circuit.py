"""rv32im circuit data + constraint evaluation.

Reference parity: risc0/circuit/rv32im/src/zirgen/{taps.rs,circuit.rs} and the
generated rust_poly_fp constraint DAG (extracted to data/*.npz).
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

from ... import field as F
from ...taps import Reg, TapSet

# reference circuit/rv32im/src/zirgen/info.rs:23
CIRCUIT_INFO = b"RV32IM:v2rev2___"
OUTPUT_SIZE = 90   # globals (defs.rs.inc REGCOUNT_GLOBAL)
MIX_SIZE = 36      # accum mix elems (REGCOUNT_MIX)

_DATA = os.path.join(os.path.dirname(__file__), "data")

# op codes (scripts/extract_rv32im.py pack())
FCONST, FTAP, FGLOBAL, FSCR_RD, FADD, FSUB, FMUL, ECONST, EMADD, FSCR_WR, \
    ESCR_WR, ESCR_RD, EADD, ESUB, EMUL, ESCALE, EADDF, FSUBE, ESUBF = range(19)

BUF_ACCUM, BUF_DATA, BUF_GLOBAL, BUF_MIX = 0, 1, 2, 3
_BUF_TO_GROUP = {BUF_ACCUM: 0, BUF_DATA: 2}


def _taps_to_tapset(tz) -> TapSet:
    """Convert the extracted taps table to our TapSet structure."""
    taps = tz["taps"]  # (n,5): offset, back, group, combo, skip
    combo_taps = list(tz["combo_taps"])
    combo_begin = list(tz["combo_begin"])
    combos = [tuple(int(b) for b in combo_taps[combo_begin[i]:combo_begin[i + 1]])
              for i in range(int(tz["combos_count"]))]
    # registers: group by (group, offset)
    regs = []
    seen = {}
    for offset, back, group, combo, _skip in taps:
        key = (int(group), int(offset))
        if key not in seen:
            seen[key] = (int(combo), [])
        seen[key][1].append(int(back))
    for (group, offset), (combo, backs) in sorted(seen.items()):
        regs.append(Reg(group, offset, combo, tuple(sorted(backs))))
    ts = TapSet(("accum", "code", "data"), regs, combos)
    assert ts.tap_size == len(taps)
    assert ts.reg_count == int(tz["reg_count"])
    return ts


class Rv32imCircuit:
    def __init__(self, taps: TapSet, opcode, operands, n_f, n_e,
                 fscr_size, escr_size, ret, mix_powers=None):
        self.taps = taps
        self.CIRCUIT_INFO = CIRCUIT_INFO
        self.OUTPUT_SIZE = OUTPUT_SIZE
        self.MIX_SIZE = MIX_SIZE
        self.opcode = opcode
        self.operands = operands
        self.n_f = int(n_f)
        self.n_e = int(n_e)
        self.fscr_size = int(fscr_size)
        self.escr_size = int(escr_size)
        self.ret = ("e", int(ret))  # the final value is always an ext reg
        # poly_mix[k] in the generated code means mix^POLY_MIX_POWERS[k]
        # (reference <circuit>/src/.../info.rs); identity if absent
        ks = operands[opcode == EMADD][:, 2]
        max_k = int(ks.max())
        if mix_powers is None:
            mix_powers = np.arange(max_k + 1, dtype=np.uint32)
        self.mix_powers = np.asarray(mix_powers, np.uint32)
        assert len(self.mix_powers) > max_k
        # (group, offset, back) -> tap index in eval_u order
        self._tap_index = {}
        i = 0
        for reg in taps.regs:
            for b in reg.backs:
                self._tap_index[(reg.group, reg.offset, b)] = i
                i += 1

    def mix_pows(self, poly_mix):
        """(n, 4) table with entry k = poly_mix^POLY_MIX_POWERS[k]."""
        pm = np.asarray(poly_mix, np.uint32)
        out = np.zeros((len(self.mix_powers), 4), np.uint32)
        # compute all needed powers via square-and-multiply per entry
        cache = {0: F.encode_np(np.array([1, 0, 0, 0], np.uint32))}
        def pw(e):
            if e in cache:
                return cache[e]
            if e % 2 == 0:
                h = pw(e // 2)
                v = F.ext_mul_np(h, h)
            else:
                v = F.ext_mul_np(pw(e - 1), pm)
            cache[e] = v
            return v
        for k, e in enumerate(self.mix_powers):
            out[k] = pw(int(e))
        return out

    # -- verifier-side scalar evaluation (replaces generated poly_ext.rs) ----
    def poly_ext(self, poly_mix, eval_u, out, mix):
        """Evaluate the mixed constraint polynomial at the DEEP point.

        poly_mix: (4,) ext Montgomery; eval_u: (num_taps, 4); out: (90,) base
        Montgomery words; mix: (36,) base Montgomery words.  Returns (4,).
        All "Fp" ops lift to the extension field, mirroring the reference's
        generated poly_ext (which computes over ExtElems of the openings).
        """
        em = F.ext_mul_np
        ea = F.add_np
        es = F.sub_np

        pm = self.mix_pows(poly_mix)

        fregs = np.zeros((self.n_f, 4), np.uint32)
        eregs = np.zeros((self.n_e, 4), np.uint32)
        fscr = np.zeros((self.fscr_size, 4), np.uint32)
        escr = np.zeros((self.escr_size, 4), np.uint32)
        eval_u = np.asarray(eval_u, np.uint32)

        def embed(v):
            o = np.zeros(4, np.uint32)
            o[0] = v
            return o

        out_e = np.asarray(out, np.uint32)
        mix_e = np.asarray(mix, np.uint32)

        for op, row in zip(self.opcode, self.operands):
            a, b, c, d, e, f_ = row
            if op == FCONST:
                fregs[a] = embed(F.s_encode(int(b)))
            elif op == FTAP:
                fregs[a] = eval_u[self._tap_index[(_BUF_TO_GROUP[int(b)],
                                                  int(c), int(d))]]
            elif op == FGLOBAL:
                src = out_e if b == BUF_GLOBAL else mix_e
                fregs[a] = embed(int(src[int(c)]))
            elif op == FSCR_RD:
                fregs[a] = fscr[b]
            elif op == FADD:
                fregs[a] = ea(fregs[b], fregs[c])
            elif op == FSUB:
                fregs[a] = es(fregs[b], fregs[c])
            elif op == FMUL:
                fregs[a] = em(fregs[b], fregs[c])
            elif op == ECONST:
                eregs[a] = F.encode_np(np.array([b, c, d, e], np.uint32))
            elif op == EMADD:
                term = pm[c]
                if d >= 0:
                    term = em(term, fregs[d])
                if e >= 0:
                    term = em(term, fregs[e])
                if f_ >= 0:
                    term = em(term, eregs[f_])
                eregs[a] = ea(eregs[b], term)
            elif op == FSCR_WR:
                fscr[a] = fregs[b]
            elif op == ESCR_WR:
                escr[a] = eregs[b]
            elif op == ESCR_RD:
                eregs[a] = escr[b]
            elif op == EADD:
                eregs[a] = ea(eregs[b], eregs[c])
            elif op == ESUB:
                eregs[a] = es(eregs[b], eregs[c])
            elif op == EMUL:
                eregs[a] = em(eregs[b], eregs[c])
            elif op == ESCALE:
                eregs[a] = em(eregs[b], fregs[c])
            elif op == EADDF:
                eregs[a] = ea(eregs[b], fregs[c])
            elif op == FSUBE:
                eregs[a] = es(fregs[b], eregs[c])
            elif op == ESUBF:
                eregs[a] = es(eregs[b], fregs[c])
            else:
                raise ValueError(f"bad opcode {op}")
        kind, reg = self.ret
        assert kind == "e"
        return eregs[int(reg)]


    # -- prover-side batch evaluation over the 4x domain (numpy oracle) ------
    def eval_check_np(self, groups, globals_list, poly_mix, po2,
                      stride=4, divide=True):
        """Host batch eval_check: same semantics as eval_check, vectorized
        with numpy over the domain.  Conformance oracle + small-domain use.

        With stride=1, divide=False this evaluates the raw constraint
        polynomial on the trace domain itself (taps roll by `back` rows, no
        zeros-poly division): a valid witness yields all-zero output."""
        mix_g, out_g = globals_list
        accum, code, data = (np.asarray(g, np.uint32) for g in groups)
        cycles = 1 << po2
        domain = cycles * stride

        pm_pows = self.mix_pows(poly_mix)

        if divide:
            w = F.s_encode(F.ROU_FWD[po2 + 2])
            kpow = F.s_pow(F.s_encode(3), cycles)
            wq = F.s_pow(w, cycles)
            ys, cw = [], F.R % F.P
            for _ in range(4):
                ys.append(F.s_inv(F.s_sub(F.s_mul(kpow, cw), F.R % F.P)))
                cw = F.s_mul(cw, wq)
            inv_zeros = np.tile(np.array(ys, np.uint32), domain // 4)

        bufs = {BUF_ACCUM: accum, BUF_DATA: data}
        fregs = np.zeros((self.n_f, domain), np.uint32)
        eregs = np.zeros((self.n_e, domain, 4), np.uint32)
        fscr = np.zeros((self.fscr_size, domain), np.uint32)
        escr = np.zeros((self.escr_size, domain, 4), np.uint32)

        em, ea, es, fm = F.ext_mul_np, F.add_np, F.sub_np, F.mul_np
        for op, row in zip(self.opcode, self.operands):
            a, b, c, d, e, f_ = (int(x) for x in row)
            if op == FCONST:
                fregs[a] = F.s_encode(b)
            elif op == FTAP:
                fregs[a] = np.roll(bufs[b][c], stride * d)
            elif op == FGLOBAL:
                src = out_g if b == BUF_GLOBAL else mix_g
                fregs[a] = int(src[c])
            elif op == FSCR_RD:
                fregs[a] = fscr[b]
            elif op == FADD:
                fregs[a] = ea(fregs[b], fregs[c])
            elif op == FSUB:
                fregs[a] = es(fregs[b], fregs[c])
            elif op == FMUL:
                fregs[a] = fm(fregs[b], fregs[c])
            elif op == ECONST:
                eregs[a] = F.encode_np(np.array([b, c, d, e], np.uint32))
            elif op == EMADD:
                term = np.broadcast_to(pm_pows[c], (domain, 4))
                if d >= 0:
                    term = fm(term, fregs[d][:, None])
                if e >= 0:
                    term = fm(term, fregs[e][:, None])
                if f_ >= 0:
                    term = em(term, eregs[f_])
                eregs[a] = ea(eregs[b], term)
            elif op == FSCR_WR:
                fscr[a] = fregs[b]
            elif op == ESCR_WR:
                escr[a] = eregs[b]
            elif op == ESCR_RD:
                eregs[a] = escr[b]
            elif op == EADD:
                eregs[a] = ea(eregs[b], eregs[c])
            elif op == ESUB:
                eregs[a] = es(eregs[b], eregs[c])
            elif op == EMUL:
                eregs[a] = em(eregs[b], eregs[c])
            elif op == ESCALE:
                eregs[a] = fm(eregs[b], fregs[c][:, None])
            elif op == EADDF:
                t = eregs[b].copy()
                t[:, 0] = ea(t[:, 0], fregs[c])
                eregs[a] = t
            elif op == FSUBE:
                fe = np.zeros((domain, 4), np.uint32)
                fe[:, 0] = fregs[b]
                eregs[a] = es(fe, eregs[c])
            elif op == ESUBF:
                fe = np.zeros((domain, 4), np.uint32)
                fe[:, 0] = fregs[c]
                eregs[a] = es(eregs[b], fe)
            else:
                raise ValueError(f"bad opcode {op}")
        tot = eregs[self.ret[1]]
        if not divide:
            return tot.T  # (4, domain) raw constraint values
        return fm(tot, inv_zeros[:, None]).T  # (4, domain)

    # -- prover-side vectorized evaluation over the 4x domain ----------------
    def eval_check(self, groups, globals_list, poly_mix, po2):
        """Device eval_check (reference rv32im prove/hal/cpu.rs:144-207).

        EXPERIMENTAL: tracing the 26k-op IR into one XLA graph compiles too
        slowly for production; the round-2 plan is a level-scheduled
        register-allocated interpreter (see PROGRESS notes).

        groups: [accum (103, domain), code (1, domain), data (211, domain)]
        natural-order evaluations; globals_list: [mix (36,), out (90,)] host
        Montgomery words.  Returns the (4, domain) planar check polynomial.
        """
        import jax.numpy as jnp

        mix_g, out_g = globals_list
        accum, _code, data = groups
        cycles = 1 << po2
        domain = cycles * 4

        pm_pows = self.mix_pows(poly_mix)

        # zeros polynomial (3x)^cycles - 1, period 4 over the domain
        w = F.s_encode(F.ROU_FWD[po2 + 2])
        kpow = F.s_pow(F.s_encode(3), cycles)
        wq = F.s_pow(w, cycles)
        ys, cw = [], F.R % F.P
        for _ in range(4):
            ys.append(F.s_inv(F.s_sub(F.s_mul(kpow, cw), F.R % F.P)))
            cw = F.s_mul(cw, wq)
        inv_zeros = np.tile(np.array(ys, np.uint32), domain // 4)

        return _eval_check_traced(
            self, accum, data, jnp.asarray(pm_pows),
            jnp.asarray(np.asarray(out_g, np.uint32)),
            jnp.asarray(np.asarray(mix_g, np.uint32)),
            jnp.asarray(inv_zeros))


def _eval_check_traced(c: "Rv32imCircuit", accum, data, pm_pows, out_g, mix_g,
                       inv_zeros):
    """Trace the 26k-op IR into one XLA computation (jit-cached per shape)."""
    import jax

    return _eval_check_impl(c, accum, data, pm_pows, out_g, mix_g, inv_zeros)


from functools import partial as _partial

import jax as _jax


@_partial(_jax.jit, static_argnames=("c",))
def _eval_check_impl(c, accum, data, pm_pows, out_g, mix_g, inv_zeros):
    import jax.numpy as jnp

    domain = accum.shape[1]
    bufs = {BUF_ACCUM: accum, BUF_DATA: data}
    tap_cache = {}

    def tap(buf, col, back):
        key = (buf, col, back)
        if key not in tap_cache:
            v = bufs[buf][col]
            tap_cache[key] = jnp.roll(v, 4 * back) if back else v
        return tap_cache[key]

    fregs = [None] * c.n_f
    eregs = [None] * c.n_e
    fscr = [None] * c.fscr_size
    escr = [None] * c.escr_size
    mont_consts = {}

    def fconst(v):
        if v not in mont_consts:
            mont_consts[v] = jnp.full((domain,), F.s_encode(int(v)), jnp.uint32)
        return mont_consts[v]

    for op, row in zip(c.opcode, c.operands):
        a, b, cc, d, e, f_ = (int(x) for x in row)
        if op == FCONST:
            fregs[a] = fconst(b)
        elif op == FTAP:
            fregs[a] = tap(b, cc, d)
        elif op == FGLOBAL:
            src = out_g if b == BUF_GLOBAL else mix_g
            fregs[a] = jnp.full((domain,), src[cc], jnp.uint32)
        elif op == FSCR_RD:
            fregs[a] = fscr[b]
        elif op == FADD:
            fregs[a] = F.add(fregs[b], fregs[cc])
        elif op == FSUB:
            fregs[a] = F.sub(fregs[b], fregs[cc])
        elif op == FMUL:
            fregs[a] = F.mul(fregs[b], fregs[cc])
        elif op == ECONST:
            vals = F.encode_np(np.array([b, cc, d, e], np.uint32))
            eregs[a] = jnp.broadcast_to(jnp.asarray(vals), (domain, 4))
        elif op == EMADD:
            term = jnp.broadcast_to(pm_pows[cc], (domain, 4))
            if d >= 0:
                term = F.mul(term, fregs[d][:, None])
            if e >= 0:
                term = F.mul(term, fregs[e][:, None])
            if f_ >= 0:
                term = F.ext_mul(term, eregs[f_])
            eregs[a] = F.add(eregs[b], term)
        elif op == FSCR_WR:
            fscr[a] = fregs[b]
        elif op == ESCR_WR:
            escr[a] = eregs[b]
        elif op == ESCR_RD:
            eregs[a] = escr[b]
        elif op == EADD:
            eregs[a] = F.add(eregs[b], eregs[cc])
        elif op == ESUB:
            eregs[a] = F.sub(eregs[b], eregs[cc])
        elif op == EMUL:
            eregs[a] = F.ext_mul(eregs[b], eregs[cc])
        elif op == ESCALE:
            eregs[a] = F.mul(eregs[b], fregs[cc][:, None])
        elif op == EADDF:
            eregs[a] = F.add(eregs[b], jnp.stack(
                [fregs[cc]] + [jnp.zeros((domain,), jnp.uint32)] * 3, axis=-1))
        elif op == FSUBE:
            fe = jnp.zeros((domain, 4), jnp.uint32).at[:, 0].set(fregs[b])
            eregs[a] = F.sub(fe, eregs[cc])
        elif op == ESUBF:
            fe = jnp.zeros((domain, 4), jnp.uint32).at[:, 0].set(fregs[cc])
            eregs[a] = F.sub(eregs[b], fe)
        else:
            raise ValueError(f"bad opcode {op}")

    tot = eregs[c.ret[1]]  # (domain, 4)
    ret = F.mul(tot, inv_zeros[:, None])
    return ret.T  # (4, domain)


@lru_cache(maxsize=1)
def load_circuit() -> Rv32imCircuit:
    tz = np.load(os.path.join(_DATA, "taps.npz"))
    ir = np.load(os.path.join(_DATA, "poly_fp_ir.npz"), allow_pickle=True)
    taps = _taps_to_tapset(tz)
    return Rv32imCircuit(
        taps, ir["opcode"], ir["operands"], ir["n_f"], ir["n_e"],
        ir["fscr_size"], ir["escr_size"], ir["ret"],
        ir["mix_powers"] if "mix_powers" in ir.files else None)
