"""Device exec witgen: the rv32im per-cycle witness program on the chip.

witgen_exec.bin (extracted from the reference's generated step_Top,
rv32im-sys/kernels/cxx/steps.cpp + ffi.cpp:200-291) is an 80k-op per-row
program with forward-only control flow.  Like accum_device.py it is
if-converted ONCE into a predicated scalar dataflow graph and evaluated
for ALL rows at once on the device — the data witness matrix is BORN on
the chip, removing both the host C++ interpreter pass and the
~0.8 GB/prove host->device witness transfer at po2=20.

Row-parallel semantics (mirroring the reference's poolstl parallel
witgen, ffi.cpp:276-291): every back-row read targets an INJECTOR-
initialized cell (prove/witgen/mod.rs:330-386 scatters the stateful and
accelerator columns before the parallel pass; a program write over an
injected cell must equal it, so reads are order-independent), which
makes back-reads pure rolls of the initial columns.  The two lookup-table
phases become two passes of the same graph: pass 1 evaluates each
X_LOOKUP_DELTA site's (table, index, mask) and scatter-adds the u8/u16
histograms; pass 2 re-evaluates with the final histograms feeding the
X_LOOKUP_CURRENT reads (the final-table rows).  The per-row memory-
transaction cursor (extern_getMemoryTxn, ffi.cpp:62) is a masked running
counter feeding dynamic gathers from the transaction stream.

Checks: every EQZ/range/cursor validation accumulates into a bad-row
mask (one scalar readback); write-once consistency is NOT re-checked on
device — csrc/witgen.cpp remains the diagnostic oracle.

Conformance: tests/test_exec_device.py — bit-exact data/global/tables vs
the host C++ interpreter on real executed segments.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ... import field as F
from . import accum_device as G
from .accum_device import (ADD, AND, BAND, BIGG, CYC, CYCG, DATA, DEC, ENC,
                           EQU, EQZB, GLOB, GLOBIN, HISTG, IADD, INIT,
                           INRANGE, INV, ISZ, K, MODU, MUL, NEG, NOT, NZ,
                           OR, PAIR16, ROLLINIT, ROWIDX, SEL, SHRI, SUB,
                           TXNG, XDIVQ, XDIVR, Graph)

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
P = F.P
INVALID = np.uint32(0xFFFFFFFF)
NUM_DATA = 211
NUM_GLOBAL = 90

# bytecode opcodes (csrc/witgen.cpp:92-99)
(B_CONST, B_ADD, B_SUB, B_MUL, B_NEG, B_ISZ, B_INV, B_BITAND, B_MOD,
 B_INRANGE, B_LOAD, B_STORE, B_ELOAD, B_ESTORE, B_EADD, B_ESUB, B_EMUL,
 B_EINV, B_EMULS, B_EFROMVAL, B_ECONST, B_EEQZ, B_MOV, B_EMOV, B_EQZ,
 B_JZ, B_JMP, B_UNREACH, X_MAJOR_MINOR, X_MEM_TXN, X_LOOKUP_DELTA,
 X_LOOKUP_CURRENT, X_MEMORY_DELTA, X_DIFF_COUNT, X_IS_FIRST, X_DIVIDE,
 X_HOST_READ_PREP, X_HOST_WRITE, X_NEXT_PAGING, X_BIGINT) = range(40)


def _load_bytecode():
    with open(os.path.join(_DATA_DIR, "witgen_exec.bin"), "rb") as f:
        magic, n_ops, n_slots, n_ext, _ = struct.unpack("<4sIIII",
                                                        f.read(20))
        assert magic == b"WGN1"
        ops = np.frombuffer(f.read(n_ops * 20), np.uint32).reshape(n_ops, 5)
        ext = np.frombuffer(f.read(n_ext * 16), np.uint32).reshape(n_ext, 4)
    return ops, int(n_slots), ext


class ExecGraph:
    def __init__(self, g, data_cols, glob_sites, delta_sites, bad,
                 init_cols, roll_specs, first_current_pc=0):
        self.g = g
        self.data_cols = data_cols      # 211 node ids (std domain)
        self.glob_sites = glob_sites    # [(col, cond_node, val_node)]
        self.delta_sites = delta_sites  # [(m8, m16, index_node, pc)]
        self.bad = bad
        self.init_cols = sorted(init_cols)     # data cols read as INIT
        self.roll_specs = sorted(roll_specs)   # (col, back) ROLLINIT reads
        self.first_current_pc = first_current_pc


def build_exec_graph():
    ops, n_slots, extconsts = _load_bytecode()
    n_ops = len(ops)
    g = Graph()

    leaders = {0}
    for pc in range(n_ops):
        op, _d, _a, b, _c = ops[pc]
        if op in (B_JZ, B_JMP):
            assert b > pc, "exec CFG must be forward-only"
            leaders.add(int(b))
            leaders.add(pc + 1)
    leaders = sorted(leaders)

    env = {}
    data_state = {}     # data col -> node (std)
    glob_state = {}     # global col -> node (value a ROW would have written)
    glob_sites = []     # ordered write sites (col, cond, val)
    delta_sites = []
    incoming = {0: [g.TRUE]}
    bad_terms = []
    init_cols = set()
    roll_specs = set()

    def raw(kind, a=0, b=0, c=0, dom="s"):
        return g._raw(kind, a, b, c, dom)

    cyc = [raw(CYC, f) for f in range(11)]
    rowidx = raw(ROWIDX)
    cursor0 = cyc[6]

    def iadd(a, b):
        if g.is_k(b) and g.kval(b) == 0:
            return a
        return raw(IADD, a, b)

    def equ(a, b):   # raw u32 equality -> bool
        if a == b:
            return g.TRUE
        return raw(EQU, *sorted((a, b)), dom="b")

    for bi, lo in enumerate(leaders):
        hi = leaders[bi + 1] if bi + 1 < len(leaders) else n_ops
        conds = incoming.pop(lo, None)
        if not conds:
            continue
        c = conds[0]
        for extra in conds[1:]:
            c = g.bor(c, extra)

        local = {}
        data_local = {}
        glob_local = {}
        glob_sites_local = []
        cursor_in = env.get("__cursor__", cursor0)
        cursor = cursor_in

        def rd(slot):
            slot = int(slot)
            v = local.get(slot)
            if v is None:
                v = env.get(slot)
            return g.k(0) if v is None else v

        def wr(slot, v):
            local[int(slot)] = v

        def buf_load(buf, col, back):
            buf, col, back = int(buf), int(col), int(back)
            if buf == 0:
                if back > 0:
                    roll_specs.add((col, back))
                    return raw(ROLLINIT, col, back)
                v = data_local.get(col)
                if v is None:
                    v = data_state.get(col)
                if v is None:
                    init_cols.add(col)
                    v = raw(INIT, col)
                return v
            if buf == 1:
                v = glob_local.get(col)
                if v is None:
                    v = glob_state.get(col)
                return raw(GLOBIN, col) if v is None else v
            raise AssertionError(f"exec load from buf {buf}")

        def buf_store(buf, col, v):
            buf, col = int(buf), int(col)
            if buf == 0:
                data_local[col] = v
            elif buf == 1:
                glob_local[col] = v
                glob_sites_local.append((col, v))
            else:
                raise AssertionError(f"exec store to buf {buf}")

        fallthrough = True
        pc = lo
        while pc < hi:
            op, d, a, b, cc = (int(x) for x in ops[pc])
            if op == B_CONST:
                wr(d, g.k(a))
            elif op == B_ADD:
                wr(d, g.fadd(rd(a), rd(b)))
            elif op == B_SUB:
                wr(d, g.fsub(rd(a), rd(b)))
            elif op == B_MUL:
                wr(d, g.fmul(rd(a), rd(b)))
            elif op == B_NEG:
                wr(d, g.fneg(rd(a)))
            elif op == B_ISZ:
                wr(d, g.sel(g.eq0(rd(a)), g.k(1), g.k(0)))
            elif op == B_INV:
                wr(d, g.finv(rd(a)))
            elif op == B_BITAND:
                wr(d, raw(BAND, *sorted((g.to_std(rd(a)), g.to_std(rd(b))))))
            elif op == B_MOD:
                wr(d, raw(MODU, g.to_std(rd(a)), g.to_std(rd(b))))
            elif op == B_INRANGE:
                lo_v, x, hi_v = (g.to_std(rd(r)) for r in (a, b, cc))
                wr(d, raw(INRANGE, lo_v, x, hi_v))
            elif op == B_LOAD:
                wr(d, buf_load(cc, a, b))
            elif op == B_STORE:
                buf_store(cc, a, g.to_std(rd(b)))
            elif op == B_ELOAD:
                for i in range(4):
                    wr(d + i, buf_load(cc, a + i, b))
            elif op == B_ESTORE:
                for i in range(4):
                    buf_store(cc, a + i, g.to_std(rd(b + i)))
            elif op == B_EADD:
                for i in range(4):
                    wr(d + i, g.fadd(rd(a + i), rd(b + i)))
            elif op == B_ESUB:
                for i in range(4):
                    wr(d + i, g.fsub(rd(a + i), rd(b + i)))
            elif op == B_EMUL:
                av = [rd(a + i) for i in range(4)]
                bv = [rd(b + i) for i in range(4)]
                nb = g.k(F.NBETA)
                wr(d + 0, g.fadd(
                    g.fmul(av[0], bv[0]),
                    g.fmul(nb, g.fadd(g.fadd(g.fmul(av[1], bv[3]),
                                             g.fmul(av[2], bv[2])),
                                      g.fmul(av[3], bv[1])))))
                wr(d + 1, g.fadd(
                    g.fadd(g.fmul(av[0], bv[1]), g.fmul(av[1], bv[0])),
                    g.fmul(nb, g.fadd(g.fmul(av[2], bv[3]),
                                      g.fmul(av[3], bv[2])))))
                wr(d + 2, g.fadd(
                    g.fadd(g.fmul(av[0], bv[2]), g.fmul(av[1], bv[1])),
                    g.fadd(g.fmul(av[2], bv[0]),
                           g.fmul(nb, g.fmul(av[3], bv[3])))))
                wr(d + 3, g.fadd(
                    g.fadd(g.fmul(av[0], bv[3]), g.fmul(av[1], bv[2])),
                    g.fadd(g.fmul(av[2], bv[1]), g.fmul(av[3], bv[0]))))
            elif op == B_EINV:
                av = [rd(a + i) for i in range(4)]
                beta = g.k(F.BETA)
                nbeta = g.k(F.NBETA)
                b0 = g.fadd(g.fmul(av[0], av[0]),
                            g.fmul(beta, g.fsub(
                                g.fmul(av[1], g.fadd(av[3], av[3])),
                                g.fmul(av[2], av[2]))))
                b2 = g.fadd(g.fsub(g.fmul(av[0], g.fadd(av[2], av[2])),
                                   g.fmul(av[1], av[1])),
                            g.fmul(beta, g.fmul(av[3], av[3])))
                cn = g.fadd(g.fmul(b0, b0), g.fmul(beta, g.fmul(b2, b2)))
                ic = g.finv(cn)
                b0 = g.fmul(b0, ic)
                b2 = g.fmul(b2, ic)
                wr(d + 0, g.fadd(g.fmul(av[0], b0),
                                 g.fmul(beta, g.fmul(av[2], b2))))
                wr(d + 1, g.fadd(g.fmul(g.fneg(av[1]), b0),
                                 g.fmul(nbeta, g.fmul(av[3], b2))))
                wr(d + 2, g.fadd(g.fmul(g.fneg(av[0]), b2),
                                 g.fmul(av[2], b0)))
                wr(d + 3, g.fsub(g.fmul(av[1], b2), g.fmul(av[3], b0)))
            elif op == B_EMULS:
                s2 = rd(b)
                for i in range(4):
                    wr(d + i, g.fmul(rd(a + i), s2))
            elif op == B_EFROMVAL:
                wr(d, rd(a))
                for i in range(1, 4):
                    wr(d + i, g.k(0))
            elif op == B_ECONST:
                for i in range(4):
                    wr(d + i, g.k(int(extconsts[a][i])))
            elif op in (B_EEQZ, B_EQZ):
                n = 4 if op == B_EEQZ else 1
                for i in range(n):
                    bad_terms.append(g.band(c, g.nz(rd(a + i))))
            elif op == B_MOV:
                wr(d, rd(a))
            elif op == B_EMOV:
                for i in range(4):
                    wr(d + i, rd(a + i))
            elif op == B_JZ:
                z = g.eq0(rd(a))
                incoming.setdefault(b, []).append(g.band(c, z))
                incoming.setdefault(hi, []).append(g.band(c, g.bnot(z)))
                fallthrough = False
            elif op == B_JMP:
                incoming.setdefault(b, []).append(c)
                fallthrough = False
            elif op == B_UNREACH:
                bad_terms.append(c)
            elif op == X_MAJOR_MINOR:
                wr(d, cyc[2])
                wr(d + 1, cyc[3])
            elif op == X_MEM_TXN:
                addr = g.to_std(rd(a))
                t = [raw(TXNG, cursor, f) for f in range(5)]
                # validations (ffi.cpp:62 extern_getMemoryTxn)
                bad_terms.append(g.band(c, g.bnot(
                    equ(raw(SHRI, t[1], 1), rowidx))))
                bad_terms.append(g.band(c, g.bnot(equ(t[0], addr))))
                wr(d, t[3])                               # prevCycle
                wr(d + 1, raw(BAND, t[4], g.k(0xFFFF)))   # prevWord lo
                wr(d + 2, raw(SHRI, t[4], 16))
                wr(d + 3, raw(BAND, t[2], g.k(0xFFFF)))   # word lo
                wr(d + 4, raw(SHRI, t[2], 16))
                mask = g.sel(c, g.k(1), g.k(0))
                cursor = iadd(cursor, mask)
            elif op == X_LOOKUP_DELTA:
                table = g.to_std(rd(a))
                index = g.to_std(rd(b))
                is8 = equ(table, g.k(8))
                is16 = equ(table, g.k(16))
                is0 = g.eq0(table)
                bad_terms.append(g.band(c, g.bnot(
                    g.bor(is0, g.bor(is8, is16)))))
                inr8 = g.nz(raw(INRANGE, g.k(0), index, g.k(256)))
                inr16 = g.nz(raw(INRANGE, g.k(0), index, g.k(65536)))
                bad_terms.append(g.band(g.band(c, is8), g.bnot(inr8)))
                bad_terms.append(g.band(g.band(c, is16), g.bnot(inr16)))
                delta_sites.append((g.band(c, is8), g.band(c, is16), index, pc))
            elif op == X_LOOKUP_CURRENT:
                table = g.to_std(rd(a))
                index = g.to_std(rd(b))
                wr(d, g.sel(equ(table, g.k(8)),
                            raw(HISTG, index, 8), raw(HISTG, index, 16)))
            elif op == X_MEMORY_DELTA:
                pass
            elif op == X_DIFF_COUNT:
                wr(d, raw(CYCG, g.to_std(rd(a))))
            elif op == X_IS_FIRST:
                wr(d, g.sel(equ(rowidx, g.k(0)), g.k(1), g.k(0)))
            elif op == X_DIVIDE:
                numer = raw(PAIR16, g.to_std(rd(a)),
                            g.to_std(rd(b & 0xFFFF)))
                denom = raw(PAIR16, g.to_std(rd(b >> 16)),
                            g.to_std(rd(cc & 0xFFFF)))
                sign = g.to_std(rd(cc >> 16))
                q = raw(XDIVQ, numer, denom, sign)
                r = raw(XDIVR, numer, denom, sign)
                wr(d, raw(BAND, q, g.k(0xFFFF)))
                wr(d + 1, raw(SHRI, q, 16))
                wr(d + 2, raw(BAND, r, g.k(0xFFFF)))
                wr(d + 3, raw(SHRI, r, 16))
            elif op in (X_HOST_READ_PREP, X_HOST_WRITE):
                wr(d, raw(TXNG, cursor, 2))
            elif op == X_NEXT_PAGING:
                wr(d, cyc[7])
                wr(d + 1, cyc[4])
            elif op == X_BIGINT:
                for i in range(16):
                    wr(d + i, raw(BIGG, cyc[8], i))
            else:
                raise NotImplementedError(f"exec bytecode op {op}")
            pc += 1
        if fallthrough and hi < n_ops:
            incoming.setdefault(hi, []).append(c)

        for slot, v in local.items():
            old = env.get(slot)
            env[slot] = v if old is None and c == g.TRUE else \
                g.sel(c, v, old if old is not None else g.k(0))
        for col, v in data_local.items():
            old = data_state.get(col)
            if old is None:
                init_cols.add(col)
                old = raw(INIT, col)
            data_state[col] = g.sel(c, v, old)
        for col, v in glob_local.items():
            old = glob_state.get(col)
            glob_state[col] = g.sel(c, v, old if old is not None
                                    else raw(GLOBIN, col))
        for col, v in glob_sites_local:
            glob_sites.append((col, c, v))
        if cursor is not cursor_in:
            env["__cursor__"] = cursor if c == g.TRUE else \
                g.sel(c, cursor, cursor_in)

    # balanced OR tree for the bad mask
    terms = [t for t in bad_terms if t != g.FALSE] or [g.FALSE]
    while len(terms) > 1:
        terms = [g.bor(terms[i], terms[i + 1]) if i + 1 < len(terms)
                 else terms[i] for i in range(0, len(terms), 2)]

    data_cols = []
    for col in range(NUM_DATA):
        v = data_state.get(col)
        if v is None:
            init_cols.add(col)
            v = raw(INIT, col)
        data_cols.append(g.to_std(v))
    first_cur = min((pc for pc in range(n_ops)
                     if ops[pc][0] == X_LOOKUP_CURRENT), default=n_ops)
    return ExecGraph(g, data_cols, glob_sites, delta_sites, terms[0],
                     init_cols, roll_specs, first_current_pc=first_cur)


_GRAPH = None


def exec_graph():
    global _GRAPH
    if _GRAPH is None:
        _GRAPH = build_exec_graph()
    return _GRAPH


# ---------------------------------------------------------------------------
# numpy executor (reference/testing path)
# ---------------------------------------------------------------------------

def _deps(g, i):
    kind, a, b, c = g.nodes[i]
    if kind in (ADD, SUB, MUL, AND, OR, BAND, MODU, IADD, EQU, PAIR16):
        return (a, b)
    if kind in (NEG, INV, ENC, DEC, ISZ, NZ, EQZB, NOT, SHRI, TXNG,
                CYCG, HISTG):
        return (a,)
    if kind == BIGG:
        return (a,)
    if kind in (INRANGE, SEL, XDIVQ, XDIVR):
        return (a, b, c)
    return ()


def _divide_np(numer, denom, sign):
    """Vectorized divide_rv32im (csrc/witgen.cpp:138-160)."""
    u32 = np.uint32
    numer = numer.astype(u32)
    denom = denom.astype(u32)
    ones = (sign == 2).astype(u32)
    neg_n = (sign != 0) & (numer.astype(np.int32) < 0)
    neg_d = (sign == 1) & (denom.astype(np.int32) < 0)
    n = np.where(neg_n, (u32(0) - numer) - ones, numer).astype(u32)
    d = np.where(neg_d, (u32(0) - denom) - ones, denom).astype(u32)
    dz = d == 0
    dd = np.maximum(d, u32(1))
    quot = np.where(dz, u32(0xFFFFFFFF), n // dd).astype(u32)
    rem = np.where(dz, n, n % dd).astype(u32)
    quot_neg = (neg_n ^ neg_d).astype(u32) - (dz & neg_n).astype(u32)
    quot = np.where(quot_neg != 0, (u32(0) - quot) - ones, quot).astype(u32)
    rem = np.where(neg_n, (u32(0) - rem) - ones, rem).astype(u32)
    return quot, rem


def eval_exec_np(eg, outputs, init_data, glob_init, cycles, txns,
                 bigint_bytes, hist8, hist16):
    """Evaluate `outputs` (node ids) over all rows with numpy."""
    g = eg.g
    rows = cycles.shape[0]
    ntxn = max(1, len(txns))
    txns = txns if len(txns) else np.zeros((1, 5), np.uint32)

    live = set()
    refs = {}
    stack = list(outputs)
    while stack:
        i = stack.pop()
        if i in live:
            continue
        live.add(i)
        stack.extend(_deps(g, i))
    for i in live:
        for d in _deps(g, i):
            refs[d] = refs.get(d, 0) + 1
    for i in outputs:
        refs[i] = refs.get(i, 0) + 1

    vals = {}

    def unref(i):
        refs[i] -= 1
        if refs[i] == 0:
            vals.pop(i, None)

    R2v = np.uint32(F.R2)
    onev = np.uint32(1)
    for i in sorted(live):
        kind, a, b, c = g.nodes[i]
        if kind == K:
            v = np.uint32(a)
        elif kind == CYC:
            v = cycles[:, a]
        elif kind == ROWIDX:
            v = np.arange(rows, dtype=np.uint32)
        elif kind == INIT:
            v = init_data[a]
        elif kind == ROLLINIT:
            v = np.roll(init_data[a], b)
        elif kind == GLOBIN:
            v = np.uint32(glob_init[a])
        elif kind == TXNG:
            idx = np.minimum(vals[a], ntxn - 1)
            v = txns[idx, b]
            unref(a)
        elif kind == CYCG:
            cu = vals[a].astype(np.int64)
            v = cycles[np.minimum(cu // 2, rows - 1), 9 + (cu % 2)]
            unref(a)
        elif kind == BIGG:
            idx = np.minimum(vals[a].astype(np.int64) + b,
                             len(bigint_bytes) - 1)
            v = bigint_bytes[idx]
            unref(a)
        elif kind == HISTG:
            h = hist8 if b == 8 else hist16
            idx = np.minimum(vals[a], len(h) - 1)
            v = h[idx]
            unref(a)
        elif kind == ADD:
            v = F.add_np(vals[a], vals[b]); unref(a); unref(b)
        elif kind == SUB:
            v = F.sub_np(vals[a], vals[b]); unref(a); unref(b)
        elif kind == NEG:
            v = F.neg_np(vals[a]); unref(a)
        elif kind == MUL:
            v = F.mul_np(vals[a], vals[b]); unref(a); unref(b)
        elif kind == INV:
            v = F.inv_np(np.broadcast_to(vals[a], (rows,))); unref(a)
        elif kind == ENC:
            v = F.mul_np(vals[a], R2v); unref(a)
        elif kind == DEC:
            v = F.mul_np(vals[a], onev); unref(a)
        elif kind == ISZ:
            v = (vals[a] == 0).astype(np.uint32); unref(a)
        elif kind == INRANGE:
            v = ((vals[a] <= vals[b]) & (vals[b] < vals[c])).astype(
                np.uint32)
            unref(a); unref(b); unref(c)
        elif kind == NZ:
            v = vals[a] != 0; unref(a)
        elif kind == EQZB:
            v = vals[a] == 0; unref(a)
        elif kind == AND:
            v = vals[a] & vals[b]; unref(a); unref(b)
        elif kind == OR:
            v = vals[a] | vals[b]; unref(a); unref(b)
        elif kind == NOT:
            v = ~vals[a]; unref(a)
        elif kind == SEL:
            v = np.where(vals[a], vals[b], vals[c])
            unref(a); unref(b); unref(c)
        elif kind == BAND:
            v = vals[a] & vals[b]; unref(a); unref(b)
        elif kind == SHRI:
            v = vals[a] >> np.uint32(b); unref(a)
        elif kind == MODU:
            bb = vals[b]
            v = np.where(bb != 0, vals[a] % np.maximum(bb, 1), 0).astype(
                np.uint32)
            unref(a); unref(b)
        elif kind == IADD:
            v = (np.asarray(vals[a], np.uint32) +
                 np.asarray(vals[b], np.uint32))
            unref(a); unref(b)
        elif kind == EQU:
            v = np.asarray(vals[a]) == np.asarray(vals[b])
            unref(a); unref(b)
        elif kind == PAIR16:
            v = (np.asarray(vals[a], np.uint32) |
                 (np.asarray(vals[b], np.uint32) << np.uint32(16)))
            unref(a); unref(b)
        elif kind == XDIVQ:
            v = _divide_np(np.broadcast_to(vals[a], (rows,)),
                           np.broadcast_to(vals[b], (rows,)),
                           np.broadcast_to(vals[c], (rows,)))[0]
            unref(a); unref(b); unref(c)
        elif kind == XDIVR:
            v = _divide_np(np.broadcast_to(vals[a], (rows,)),
                           np.broadcast_to(vals[b], (rows,)),
                           np.broadcast_to(vals[c], (rows,)))[1]
            unref(a); unref(b); unref(c)
        else:
            raise AssertionError(G._KIND_NAMES[kind])
        vals[i] = v
    return {i: vals[i] for i in outputs}


def witgen_exec_np(seg, rand_z=(1, 0, 0, 0), pf=None):
    """Full device-algorithm exec witgen in numpy (oracle for the jnp
    path): pass 1 histograms -> pass 2 full witness.  Returns the same
    dict as witgen.witgen_exec."""
    from .witgen import (_load_meta, _programs, _update_p2_zcheck,
                         build_global, inject, preflight_segment)

    eg = exec_graph()
    progs = _programs()
    meta = progs["meta"]
    if pf is None:
        from ...zkvm.exec import preflight_segment as pfseg
        pf = pfseg(seg)
    _update_p2_zcheck(pf, rand_z)
    rows = len(pf["cycles"])
    init_data = inject(pf, rows, meta)
    init_zero = np.where(init_data == INVALID, 0, init_data)
    glob = build_global(seg, rand_z)
    glob_init = np.where(glob == INVALID, 0, glob)
    cycles = np.ascontiguousarray(pf["cycles"])
    txns = np.ascontiguousarray(pf["txns"])
    bigint = np.ascontiguousarray(pf.get(
        "bigint_bytes", np.zeros(0, np.uint32)))
    if len(bigint) == 0:
        bigint = np.zeros(16, np.uint32)

    hist8 = np.zeros(256, np.uint32)
    hist16 = np.zeros(65536, np.uint32)

    # pass 1: delta sites only.  X_LOOKUP_CURRENT (the final-table rows)
    # must see the counts as of the first CURRENT site in program order —
    # a table row reads its entry BEFORE its own later delta lands
    # (within C++ phase B, distinct rows touch distinct entries, so only
    # the row's own later increments are excluded).  CURRENT reads use
    # the early-site histogram; the returned tables include every site.
    cur_pc = eg.first_current_pc
    split = int(pf["table_split_cycle"])
    body_rows = np.arange(rows) < split
    p1_outputs = []
    for m8, m16, idx, _pc in eg.delta_sites:
        p1_outputs += [m8, m16, idx]
    vals = eval_exec_np(eg, p1_outputs, init_zero, glob_init, cycles,
                        txns, bigint, hist8, hist16)
    hist8_full = np.zeros(256, np.uint32)
    hist16_full = np.zeros(65536, np.uint32)

    def hist(vi, m):
        h8 = np.bincount(vi[m] & 0xFF, minlength=256)[:256] if m.any()             else np.zeros(256, np.int64)
        return h8.astype(np.uint32)

    def hist16f(vi, m):
        h = np.bincount(vi[m] & 0xFFFF, minlength=65536)[:65536]             if m.any() else np.zeros(65536, np.int64)
        return h.astype(np.uint32)

    for m8, m16, idx, pc in eg.delta_sites:
        v8 = np.broadcast_to(vals[m8], (rows,))
        v16 = np.broadcast_to(vals[m16], (rows,))
        vi = np.broadcast_to(vals[idx], (rows,))
        hist8_full += hist(vi, v8)
        hist16_full += hist16f(vi, v16)
        # the CURRENT-read view (phase-2 rows): every body-row delta,
        # plus table-region deltas only BEFORE the first read in program
        # order (a table row reads its own entry before its later
        # increments; distinct phase-2 rows touch distinct entries)
        m8r = v8 if pc < cur_pc else (v8 & body_rows)
        m16r = v16 if pc < cur_pc else (v16 & body_rows)
        hist8 += hist(vi, m8r)
        hist16 += hist16f(vi, m16r)

    # pass 2: full witness
    p2_outputs = list(eg.data_cols) + [eg.bad]
    for col, cond, val in eg.glob_sites:
        p2_outputs += [cond, val]
    vals = eval_exec_np(eg, p2_outputs, init_zero, glob_init, cycles,
                        txns, bigint, hist8, hist16)

    bad = np.broadcast_to(vals[eg.bad], (rows,))
    if bad.any():
        raise RuntimeError(
            f"exec device eval: {int(bad.sum())} rows failed in-circuit "
            "checks (run host witgen_exec for diagnostics)")

    data = np.empty((NUM_DATA, rows), np.uint32)
    for col, i in enumerate(eg.data_cols):
        data[col] = np.broadcast_to(vals[i], (rows,))

    glob_out = glob_init.copy()
    for col, cond, val in eg.glob_sites:
        m = np.broadcast_to(vals[cond], (rows,))
        if m.any():
            glob_out[col] = np.broadcast_to(vals[val], (rows,))[
                int(np.argmax(m))]

    return {"data": data, "global": glob_out, "tables_u8": hist8_full,
            "tables_u16": hist16_full, "preflight": pf, "rows": rows}


# ---------------------------------------------------------------------------
# Device (jnp) executor
# ---------------------------------------------------------------------------

class ExecPlan:
    """Grouped register-file plan for a set of exec-graph outputs.

    Input rows: consts | cyc fields | rowidx | glob scalars | init col
    slices | rollinit slices | hist-independent; TXNG/CYCG/BIGG/HISTG are
    dynamic-gather groups reading auxiliary arrays with per-row indices."""

    INPUT_KINDS = (K, CYC, ROWIDX, GLOBIN, INIT, ROLLINIT)

    def __init__(self, eg, outputs):
        g = eg.g
        live = set()
        stack = list(outputs)
        while stack:
            i = stack.pop()
            if i in live:
                continue
            live.add(i)
            stack.extend(_deps(g, i))
        order = sorted(live)
        level = {}
        for i in order:
            level[i] = 1 + max((level[d] for d in _deps(g, i)), default=0)

        row = {}
        self.const_vals = np.asarray(
            [g.kval(i) for i in order if g.nodes[i][0] == K], np.uint32)
        for i in order:
            if g.nodes[i][0] == K:
                row[i] = len(row)

        self.cyc_start = len(row)
        self.cyc_fields = []
        for i in order:
            if g.nodes[i][0] == CYC:
                row[i] = len(row)
                self.cyc_fields.append(g.nodes[i][1])

        self.rowidx_row = None
        for i in order:
            if g.nodes[i][0] == ROWIDX:
                self.rowidx_row = len(row)
                row[i] = len(row)

        self.glob_start = len(row)
        self.glob_cols = []
        for i in order:
            if g.nodes[i][0] == GLOBIN:
                row[i] = len(row)
                self.glob_cols.append(g.nodes[i][1])

        # init/rollinit rows GROUPED by back offset: each distinct back
        # becomes one shifted window slice of the padded init matrix per
        # chunk (9 distinct backs in the rv32im exec program)
        self.init_start = len(row)
        by_back = {}
        for i in order:
            kind, a, b, _c = g.nodes[i]
            if kind == INIT:
                by_back.setdefault(0, []).append((a, i))
            elif kind == ROLLINIT:
                by_back.setdefault(b, []).append((a, i))
        self.init_groups = []          # (back, cols_array, file_row_start)
        self.init_specs = []           # flat (col, back) in file order
        for back in sorted(by_back):
            entries = sorted(by_back[back])
            start = len(row)
            cols = []
            for col, i in entries:
                row[i] = len(row)
                cols.append(col)
                self.init_specs.append((col, back))
            self.init_groups.append((back, np.asarray(cols, np.int32),
                                     start))

        # greedy wavefront packing: a node joins its kind's most recent
        # open group when every operand was computed in an earlier group
        # — merges independent same-kind work across levels (the
        # (level, kind) scheme produced ~7.5k groups for the exec graph;
        # this yields far fewer, larger device ops)
        n_args = {ADD: 2, SUB: 2, MUL: 2, AND: 2, OR: 2, NEG: 1, INV: 1,
                  ENC: 1, DEC: 1, ISZ: 1, NZ: 1, EQZB: 1, NOT: 1,
                  INRANGE: 3, SEL: 3, BAND: 2, MODU: 2, IADD: 2, EQU: 2,
                  PAIR16: 2, SHRI: 1, TXNG: 1, CYCG: 1, BIGG: 1, HISTG: 1,
                  XDIVQ: 3, XDIVR: 3}
        import bisect

        glist = []          # [(kind, [members])]
        by_kind = {}        # kind -> sorted group indices
        node_grp = {}       # node -> group index (inputs: -1)
        for i in order:
            kind = g.nodes[i][0]
            if kind in self.INPUT_KINDS:
                node_grp[i] = -1
                continue
            g_req = max((node_grp[d] for d in _deps(g, i)), default=-1)
            lst = by_kind.setdefault(kind, [])
            pos = bisect.bisect_right(lst, g_req)
            if pos < len(lst):
                gi = lst[pos]       # earliest valid group of this kind
            else:
                gi = len(glist)
                glist.append((kind, []))
                lst.append(gi)
            glist[gi][1].append(i)
            node_grp[i] = gi

        self.groups = []
        for kind, members in glist:
            dst = len(row)
            for i in members:
                row[i] = len(row)
            opnds = [np.asarray([row[_deps(g, i)[s]] for i in members],
                                np.int32) for s in range(n_args[kind])]
            # immediates (SHRI shift / TXNG field / BIGG offset / HISTG
            # table) ride in the node's b field
            imms = np.asarray([g.nodes[i][2] for i in members], np.int32)
            self.groups.append((kind, dst, len(members), opnds, imms))

        self.n_rows = len(row)
        self.out_rows = np.asarray([row[i] for i in outputs], np.int32)


def _exec_group_compute(kind, ops_v, imms, aux):
    import jax.numpy as jnp

    from .accum_device import _group_compute

    if kind == TXNG:
        idx = jnp.minimum(ops_v[0], jnp.uint32(aux["ntxn"] - 1))
        # imms = txn field per member; gather per distinct field
        out = []
        for j, f in enumerate(imms):
            out.append(jnp.take(aux["txns"][int(f)], idx[j],
                                mode="clip"))
        return jnp.stack(out)
    if kind == CYCG:
        cu = ops_v[0]
        r = jnp.minimum(cu // 2, jnp.uint32(aux["rows"] - 1))
        d0 = jnp.take(aux["cyc_d0"], r, mode="clip")
        d1 = jnp.take(aux["cyc_d1"], r, mode="clip")
        return jnp.where((cu % 2) == 0, d0, d1)
    if kind == BIGG:
        idx = ops_v[0] + jnp.asarray(imms, jnp.uint32)[:, None]
        idx = jnp.minimum(idx, jnp.uint32(len(aux["bigint"]) - 1))
        return jnp.take(aux["bigint"], idx, mode="clip")
    if kind == HISTG:
        out = []
        for j, t in enumerate(imms):
            h = aux["hist8"] if int(t) == 8 else aux["hist16"]
            idx = jnp.minimum(ops_v[0][j], jnp.uint32(len(h) - 1))
            out.append(jnp.take(h, idx, mode="clip"))
        return jnp.stack(out)
    if kind == BAND:
        return ops_v[0] & ops_v[1]
    if kind == SHRI:
        return ops_v[0] >> jnp.asarray(imms, jnp.uint32)[:, None]
    if kind == MODU:
        b = ops_v[1]
        return jnp.where(b != 0, ops_v[0] % jnp.maximum(b, 1),
                         jnp.uint32(0))
    if kind == IADD:
        return ops_v[0] + ops_v[1]
    if kind == EQU:
        return (ops_v[0] == ops_v[1]).astype(jnp.uint32)
    if kind == PAIR16:
        return ops_v[0] | (ops_v[1] << jnp.uint32(16))
    if kind in (XDIVQ, XDIVR):
        q, r = _divide_jnp(ops_v[0], ops_v[1], ops_v[2])
        return q if kind == XDIVQ else r
    return _group_compute(kind, ops_v)


def _divide_jnp(numer, denom, sign):
    import jax.numpy as jnp

    u32 = jnp.uint32
    ones = (sign == 2).astype(u32)
    neg_n = (sign != 0) & (numer.astype(jnp.int32) < 0)
    neg_d = (sign == 1) & (denom.astype(jnp.int32) < 0)
    n = jnp.where(neg_n, (u32(0) - numer) - ones, numer)
    d = jnp.where(neg_d, (u32(0) - denom) - ones, denom)
    dz = d == 0
    dd = jnp.maximum(d, u32(1))
    quot = jnp.where(dz, u32(0xFFFFFFFF), n // dd)
    rem = jnp.where(dz, n, n % dd)
    quot_neg = (neg_n ^ neg_d).astype(u32) - (dz & neg_n).astype(u32)
    quot = jnp.where(quot_neg != 0, (u32(0) - quot) - ones, quot)
    rem = jnp.where(neg_n, (u32(0) - rem) - ones, rem)
    return quot, rem


_MAXBACK = 68


def _plans_exec():
    eg = exec_graph()
    if not hasattr(eg, "_plans"):
        p1o = []
        for m8, m16, idx, _pc in eg.delta_sites:
            p1o += [m8, m16, idx]
        p2o = list(eg.data_cols) + [eg.bad]
        for _col, cond, val in eg.glob_sites:
            p2o += [cond, val]
        p1 = ExecPlan(eg, p1o)
        # the two-pass algorithm requires the delta sites (masks/indices)
        # to be independent of the histograms they feed
        assert all(k != HISTG for k, *_ in p1.groups), \
            "lookup-delta sites must not depend on lookup-current reads"
        eg._plans = {"p1": p1, "p2": ExecPlan(eg, p2o)}
    return eg, eg._plans


def _init_from_inputs(cycles_t, accel_cols, accel_rows, accel_vals, inj):
    """Build the injected data matrix ON DEVICE (reference
    prove/witgen/mod.rs:330-386 Injector): dense stateful columns from
    the preflight cycles + one flat scatter for the accelerator
    back-state."""
    import jax.numpy as jnp

    rows = cycles_t.shape[1]
    init = jnp.zeros((NUM_DATA, rows), jnp.uint32)
    init = init.at[inj["cycle"]].set(jnp.arange(rows, dtype=jnp.uint32))
    init = init.at[inj["next_pc_low"]].set(cycles_t[1] & 0xFFFF)
    init = init.at[inj["next_pc_high"]].set(cycles_t[1] >> 16)
    init = init.at[inj["next_state"]].set(cycles_t[0])
    init = init.at[inj["next_machine_mode"]].set(cycles_t[4])
    init = init.at[(accel_cols, accel_rows)].set(accel_vals)
    return init


def _accel_coo(pf, rows, meta):
    """Host-side compact (cols, rows, vals) triples for the accelerator
    back-state (the sparse part of witgen.inject)."""
    inj = meta["inject"]
    kinds = pf["back_kind"]
    offs = pf["back_offset"]
    back = pf["back_data"]
    cols_l, rows_l, vals_l = [], [], []

    def add(cols, rws, vals):
        n = len(rws)
        for i, col in enumerate(cols):
            cols_l.append(np.full(n, col, np.int32))
            rows_l.append(rws.astype(np.int32))
            vals_l.append(vals[i])

    ecall = np.nonzero(kinds == 1)[0]
    if len(ecall):
        o = offs[ecall]
        add([inj["ecall_s0"], inj["ecall_s1"], inj["ecall_s2"]], ecall,
            [back[o], back[o + 1], back[o + 2]])
    p2r = np.nonzero(kinds == 3)[0]
    if len(p2r):
        o = offs[p2r]
        add(inj["p2_state"], p2r,
            [back[o + i] for i in range(len(inj["p2_state"]))])
    shar = np.nonzero(kinds == 2)[0]
    if len(shar):
        o = offs[shar]
        add(inj["sha_fp"], shar,
            [back[o + i] for i in range(len(inj["sha_fp"]))])
        for i, col in enumerate(inj["sha_u32"]):
            word = back[o + 7 + i]
            add([col + b for b in range(32)], shar,
                [(word >> b) & 1 for b in range(32)])
    bir = np.nonzero(kinds == 4)[0]
    if len(bir):
        o = offs[bir]
        add(inj["bigint_state"], bir,
            [back[o + i] for i in range(len(inj["bigint_state"]))])
    if not cols_l:
        return (np.zeros(1, np.int32), np.zeros(1, np.int32),
                np.zeros(1, np.uint32))
    return (np.concatenate(cols_l), np.concatenate(rows_l),
            np.concatenate([np.asarray(v, np.uint32) for v in vals_l]))


def _exec_pipeline(cycles_t, glob_init, txns_t, bigint, accel_cols,
                   accel_rows, accel_vals, inj, chunk, split):
    # `split` is a traced scalar (device input), NOT baked into the graph
    # — it differs per segment and must not force recompiles
    """Full device exec: init scatter -> pass 1 (histograms) -> pass 2.
    Returns (data (211, rows) std u32, glob sites matrix, bad scalar,
    hist8_full, hist16_full)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    eg, plans = _plans_exec()
    rows = cycles_t.shape[1]
    init = _init_from_inputs(cycles_t, accel_cols, accel_rows, accel_vals,
                             inj)
    init_pad = jnp.concatenate([init[:, rows - _MAXBACK:], init], axis=1)
    aux = {
        "txns": txns_t, "ntxn": txns_t.shape[1], "bigint": bigint,
        "rows": rows, "cyc_d0": cycles_t[9], "cyc_d1": cycles_t[10],
        "hist8": jnp.zeros(256, jnp.uint32),
        "hist16": jnp.zeros(65536, jnp.uint32),
    }
    body_mask_split = split.astype(jnp.uint32)

    def chunk_file(plan, i, aux):
        file = jnp.zeros((plan.n_rows, chunk), jnp.uint32)
        nk = len(plan.const_vals)
        if nk:
            file = lax.dynamic_update_slice(
                file, jnp.broadcast_to(
                    jnp.asarray(plan.const_vals)[:, None], (nk, chunk)),
                (0, 0))
        if plan.cyc_fields:
            c = lax.dynamic_slice(cycles_t, (0, i * chunk), (11, chunk))
            file = lax.dynamic_update_slice(
                file, c[jnp.asarray(plan.cyc_fields, jnp.int32)],
                (plan.cyc_start, 0))
        if plan.rowidx_row is not None:
            ridx = (jnp.arange(chunk, dtype=jnp.uint32) +
                    jnp.uint32(i * chunk))
            file = lax.dynamic_update_slice(file, ridx[None, :],
                                            (plan.rowidx_row, 0))
        if plan.glob_cols:
            gsel = jnp.asarray(plan.glob_cols, jnp.int32)
            file = lax.dynamic_update_slice(
                file, jnp.broadcast_to(glob_init[gsel][:, None],
                                       (len(plan.glob_cols), chunk)),
                (plan.glob_start, 0))
        for back, cols, start in plan.init_groups:
            # slice the (small) chunk window first, then row-gather —
            # gathering full columns inside the loop would re-read the
            # whole init matrix every chunk
            win = lax.dynamic_slice(
                init_pad, (0, i * chunk + _MAXBACK - back),
                (NUM_DATA, chunk))[cols]
            file = lax.dynamic_update_slice(file, win, (start, 0))
        for kind, dst, _n, opnds, imms in plan.groups:
            vals = _exec_group_compute(kind, [file[ix] for ix in opnds],
                                       imms, aux)
            file = lax.dynamic_update_slice(file, vals, (dst, 0))
        return file

    # ---- pass 1: histograms -------------------------------------------
    p1 = plans["p1"]
    n_sites = len(eg.delta_sites)
    site_pc = np.asarray([pc for _m8, _m16, _i, pc in eg.delta_sites])
    late = jnp.asarray((site_pc >= eg.first_current_pc), bool)

    def p1_body(i, carry):
        h8, h16, h8f, h16f = carry
        file = chunk_file(p1, i, aux)
        outs = file[p1.out_rows].reshape(n_sites, 3, chunk)
        m8 = outs[:, 0] != 0
        m16 = outs[:, 1] != 0
        idx = outs[:, 2]
        # CURRENT-read view: body-row deltas always; table-region deltas
        # only from sites before the first CURRENT in program order
        ridx = (jnp.arange(chunk, dtype=jnp.uint32) + jnp.uint32(i * chunk))
        body_rows = (ridx < body_mask_split)[None, :]
        m8r = m8 & (body_rows | ~late[:, None])
        m16r = m16 & (body_rows | ~late[:, None])
        i8 = (idx & 0xFF).reshape(-1)
        i16 = (idx & 0xFFFF).reshape(-1)
        h8f = h8f.at[i8].add(m8.reshape(-1).astype(jnp.uint32))
        h16f = h16f.at[i16].add(m16.reshape(-1).astype(jnp.uint32))
        h8 = h8.at[i8].add(m8r.reshape(-1).astype(jnp.uint32))
        h16 = h16.at[i16].add(m16r.reshape(-1).astype(jnp.uint32))
        return h8, h16, h8f, h16f

    zeros = (jnp.zeros(256, jnp.uint32), jnp.zeros(65536, jnp.uint32),
             jnp.zeros(256, jnp.uint32), jnp.zeros(65536, jnp.uint32))
    h8, h16, h8f, h16f = lax.fori_loop(0, rows // chunk, p1_body, zeros)
    aux = dict(aux, hist8=h8, hist16=h16)

    # ---- pass 2: full witness -----------------------------------------
    p2 = plans["p2"]

    def p2_body(i, out):
        file = chunk_file(p2, i, aux)
        return lax.dynamic_update_slice(out, file[p2.out_rows],
                                        (0, i * chunk))

    out = jnp.zeros((len(p2.out_rows), rows), jnp.uint32)
    out = lax.fori_loop(0, rows // chunk, p2_body, out)

    data = out[:NUM_DATA]
    bad = jnp.sum(out[NUM_DATA], dtype=jnp.uint32)
    glob_rows = out[NUM_DATA + 1:]
    return data, glob_rows, bad, h8f, h16f


_DEVICE_FNS = {}


def witgen_exec_device(seg, rand_z=(1, 0, 0, 0), pf=None, chunk=2048):
    """Device exec witgen; same result dict as witgen.witgen_exec with
    `data` left as a DEVICE array (standard form)."""
    import jax
    import jax.numpy as jnp

    from ...hal.trace_cache import TraceCached, fingerprint
    from .witgen import _load_meta, _update_p2_zcheck, build_global

    eg, plans = _plans_exec()
    meta = _load_meta()
    if pf is None:
        from ...zkvm.exec import preflight_segment
        pf = preflight_segment(seg)
    _update_p2_zcheck(pf, rand_z)
    rows = len(pf["cycles"])
    glob = build_global(seg, rand_z)
    glob_init = np.where(glob == INVALID, 0, glob)
    cycles_t = np.ascontiguousarray(pf["cycles"].T)
    txns = pf["txns"]
    txns_t = np.ascontiguousarray(
        txns.T if len(txns) else np.zeros((5, 1), np.uint32))
    bigint = np.ascontiguousarray(pf.get(
        "bigint_bytes", np.zeros(0, np.uint32)))
    if len(bigint) == 0:
        bigint = np.zeros(16, np.uint32)
    accel_cols, accel_rows, accel_vals = _accel_coo(pf, rows, meta)
    inj = {k: meta["inject"][k] for k in
           ("cycle", "next_pc_low", "next_pc_high", "next_state",
            "next_machine_mode")}
    split = int(pf["table_split_cycle"])

    # bucket the variable-length inputs to powers of two so per-segment
    # size jitter never forces a recompile: txns pad with copies of the
    # last transaction (gathers past the live cursor are masked), the
    # accel coo pads by repeating its first entry (idempotent scatter)
    def _bucket(n):
        b = 1
        while b < n:
            b <<= 1
        return b

    nt = _bucket(txns_t.shape[1])
    if txns_t.shape[1] < nt:
        pad = np.repeat(txns_t[:, -1:], nt - txns_t.shape[1], axis=1)
        txns_t = np.concatenate([txns_t, pad], axis=1)
    nb = _bucket(len(bigint))
    if len(bigint) < nb:
        bigint = np.concatenate(
            [bigint, np.zeros(nb - len(bigint), np.uint32)])
    na = _bucket(len(accel_cols))
    if len(accel_cols) < na:
        reps = na - len(accel_cols)
        accel_cols = np.concatenate(
            [accel_cols, np.repeat(accel_cols[:1], reps)])
        accel_rows = np.concatenate(
            [accel_rows, np.repeat(accel_rows[:1], reps)])
        accel_vals = np.concatenate(
            [accel_vals, np.repeat(accel_vals[:1], reps)])

    key = (rows, chunk, nt, nb, na)
    fn = _DEVICE_FNS.get(key)
    if fn is None:
        @jax.jit
        def run(cycles_t, glob_init, txns_t, bigint, a_cols, a_rows,
                a_vals, split):
            return _exec_pipeline(cycles_t, glob_init, txns_t, bigint,
                                  a_cols, a_rows, a_vals, inj, chunk,
                                  split)

        fn = TraceCached(run, key=fingerprint(
            "exec_device", rows, chunk, nt, nb, na, len(eg.g.nodes)),
            label=f"exec_dev_{rows}")
        _DEVICE_FNS[key] = fn

    data, glob_rows, bad, h8, h16 = fn(
        jnp.asarray(cycles_t), jnp.asarray(glob_init),
        jnp.asarray(txns_t), jnp.asarray(bigint),
        jnp.asarray(accel_cols), jnp.asarray(accel_rows),
        jnp.asarray(accel_vals), jnp.asarray(split, dtype=jnp.uint32))
    if int(np.asarray(bad)) != 0:
        raise RuntimeError(
            f"exec device eval: {int(np.asarray(bad))} rows failed "
            "in-circuit checks (run host witgen_exec for diagnostics)")

    glob_np = np.asarray(glob_rows)
    glob_out = glob_init.copy()
    for si, (col, _cond, _val) in enumerate(eg.glob_sites):
        m = glob_np[2 * si] != 0
        if m.any():
            glob_out[col] = glob_np[2 * si + 1][int(np.argmax(m))]

    return {"data": data, "global": glob_out,
            "tables_u8": np.asarray(h8), "tables_u16": np.asarray(h16),
            "preflight": pf, "rows": rows}
