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
