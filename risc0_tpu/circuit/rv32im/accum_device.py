"""Device accum witgen: if-converted bytecode -> vectorized JAX program.

The rv32im accum pass (witgen_accum.bin, extracted from the reference's
generated TopAccum — risc0/circuit/rv32im-sys/kernels/cxx/ffi.cpp:311-353)
is a per-row program with forward-only control flow over an acyclic CFG.
This module translates it ONCE into a predicated straight-line scalar
dataflow graph ("if-conversion": every block gets a path-condition vector
and slot/buffer writes become selects), then evaluates ALL 2^po2 rows at
once on the device instead of interpreting row-by-row on the host C++
(12.8 s of a 55 s po2=20 prove in round 4).

Sequential state.  Accum columns 0-11 are three ext-field accumulator
registers whose next-row value is an AFFINE function of the previous row's
value (state' = C*state + d with C, d per-row ext elements — the zirgen
GenerateAccum grand accumulators).  The device algorithm recovers (C, d)
per row with two probe evaluations of the same graph (state=0 gives d,
state=1 gives C+d), resolves the recurrence with an inclusive affine
`associative_scan` (exactly the reference's phase-2 prefix structure,
ffi.cpp:330-339), and runs one final evaluation with the true previous-row
states to materialize every accum column.  Machine-region back-reads
(cols > user_accum_split) are 0 by the zeroBack guard (reference
kernels/cxx/witgen.h:118-125), so only cols 0-11 carry state.

All field arithmetic runs in Montgomery form on device (field.mul REDC);
loads from the standard-form witness are encoded on the fly, and the
output stays Montgomery so the accum Merkle commit skips its encode pass.

Conformance: tests/test_accum_device.py checks bit-exactness against the
host C++ interpreter (csrc/witgen.cpp) on real executed segments, and
validates the affine-recurrence assumption with random-state probes.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ... import field as F

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
P = F.P
INVALID = np.uint32(0xFFFFFFFF)

# bytecode opcodes (csrc/witgen.cpp:92-99)
(CONST, B_ADD, B_SUB, B_MUL, B_NEG, B_ISZ, B_INV, B_BITAND, B_MOD,
 B_INRANGE, B_LOAD, B_STORE, B_ELOAD, B_ESTORE, B_EADD, B_ESUB, B_EMUL,
 B_EINV, B_EMULS, B_EFROMVAL, B_ECONST, B_EEQZ, B_MOV, B_EMOV, B_EQZ,
 B_JZ, B_JMP, B_UNREACH) = range(28)

# graph node kinds (shared by the accum and exec translators)
(K, DATA, GLOB, MIXIN, STATE, ADD, SUB, NEG, MUL, INV, ENC, DEC, ISZ,
 INRANGE, NZ, EQZB, AND, OR, NOT, SEL,
 # exec-only kinds (exec_device.py): cycle columns, row index, dynamic
 # gathers, histogram reads, bitwise/integer ops, rv32im divide
 CYC, ROWIDX, INIT, ROLLINIT, GLOBIN, TXNG, CYCG, BIGG, HISTG,
 BAND, SHRI, MODU, XDIVQ, XDIVR, PAIR16, IADD, EQU) = range(37)

_KIND_NAMES = ("K DATA GLOB MIXIN STATE ADD SUB NEG MUL INV ENC DEC ISZ "
               "INRANGE NZ EQZB AND OR NOT SEL "
               "CYC ROWIDX INIT ROLLINIT GLOBIN TXNG CYCG BIGG HISTG "
               "BAND SHRI MODU XDIVQ XDIVR PAIR16 IADD EQU").split()

NUM_ACCUM = 103
USER_SPLIT = 23
STATE_COLS = 12   # cols 0-11: three ext accumulator registers


class Graph:
    """Hash-consed predicated dataflow graph with constant folding."""

    def __init__(self):
        self.nodes = []       # (kind, a, b, c)
        self.domain = []      # 's' std u32 field/flag, 'm' mont, 'b' bool
        self._memo = {}
        self.TRUE = self._raw(K, 1, 0, 0, "b")
        self.FALSE = self._raw(K, 0, 0, 0, "b")

    def _raw(self, kind, a, b, c, dom):
        key = (kind, a, b, c, dom)
        i = self._memo.get(key)
        if i is None:
            i = len(self.nodes)
            self.nodes.append((kind, a, b, c))
            self.domain.append(dom)
            self._memo[key] = i
        return i

    # -- constants ----------------------------------------------------------
    def k(self, v, dom="s"):
        return self._raw(K, int(v) % P if dom != "b" else int(v), 0, 0, dom)

    def is_k(self, i):
        return self.nodes[i][0] == K

    def kval(self, i):
        return self.nodes[i][1]

    # -- domain conversion --------------------------------------------------
    def to_mont(self, i):
        d = self.domain[i]
        if d == "m":
            return i
        assert d == "s"
        if self.is_k(i):
            return self.k(F.s_encode(self.kval(i)), "m")
        return self._raw(ENC, i, 0, 0, "m")

    def to_std(self, i):
        d = self.domain[i]
        if d == "s":
            return i
        assert d == "m"
        if self.is_k(i):
            return self.k(F.s_decode(self.kval(i)), "s")
        return self._raw(DEC, i, 0, 0, "s")

    # -- field arithmetic (Montgomery) --------------------------------------
    def fadd(self, a, b):
        a, b = self.to_mont(a), self.to_mont(b)
        if self.is_k(a) and self.kval(a) == 0:
            return b
        if self.is_k(b) and self.kval(b) == 0:
            return a
        if self.is_k(a) and self.is_k(b):
            return self.k(F.s_add(self.kval(a), self.kval(b)), "m")
        if a > b:
            a, b = b, a   # commutative: canonical operand order
        return self._raw(ADD, a, b, 0, "m")

    def fsub(self, a, b):
        a, b = self.to_mont(a), self.to_mont(b)
        if a == b:
            return self.k(0, "m")
        if self.is_k(b) and self.kval(b) == 0:
            return a
        if self.is_k(a) and self.is_k(b):
            return self.k(F.s_sub(self.kval(a), self.kval(b)), "m")
        return self._raw(SUB, a, b, 0, "m")

    def fneg(self, a):
        a = self.to_mont(a)
        if self.is_k(a):
            return self.k((P - self.kval(a)) % P, "m")
        return self._raw(NEG, a, 0, 0, "m")

    def fmul(self, a, b):
        a, b = self.to_mont(a), self.to_mont(b)
        one = F.R % P
        for x, y in ((a, b), (b, a)):
            if self.is_k(x):
                if self.kval(x) == 0:
                    return self.k(0, "m")
                if self.kval(x) == one:
                    return y
        if self.is_k(a) and self.is_k(b):
            return self.k(F.s_mul(self.kval(a), self.kval(b)), "m")
        if a > b:
            a, b = b, a
        return self._raw(MUL, a, b, 0, "m")

    def finv(self, a):
        a = self.to_mont(a)
        if self.is_k(a):
            return self.k(F.s_inv(self.kval(a)), "m")
        return self._raw(INV, a, 0, 0, "m")

    # -- bool/conds ---------------------------------------------------------
    def nz(self, a):   # field value != 0 (domain-independent)
        if self.is_k(a):
            return self.TRUE if self.kval(a) != 0 else self.FALSE
        return self._raw(NZ, a, 0, 0, "b")

    def eq0(self, a):
        if self.is_k(a):
            return self.TRUE if self.kval(a) == 0 else self.FALSE
        return self._raw(EQZB, a, 0, 0, "b")

    def band(self, a, b):
        if a == self.FALSE or b == self.FALSE:
            return self.FALSE
        if a == self.TRUE:
            return b
        if b == self.TRUE:
            return a
        if a == b:
            return a
        if a > b:
            a, b = b, a
        return self._raw(AND, a, b, 0, "b")

    def bor(self, a, b):
        if a == self.TRUE or b == self.TRUE:
            return self.TRUE
        if a == self.FALSE:
            return b
        if b == self.FALSE:
            return a
        if a == b:
            return a
        if a > b:
            a, b = b, a
        return self._raw(OR, a, b, 0, "b")

    def bnot(self, a):
        if a == self.TRUE:
            return self.FALSE
        if a == self.FALSE:
            return self.TRUE
        if self.nodes[a][0] == NOT:
            return self.nodes[a][1]
        return self._raw(NOT, a, 0, 0, "b")

    def sel(self, c, a, b):
        """c ? a : b (a, b coerced to a common domain)."""
        if c == self.TRUE:
            return a
        if c == self.FALSE:
            return b
        if a == b:
            return a
        da, db = self.domain[a], self.domain[b]
        if da != db:
            if "m" in (da, db):
                a, b = self.to_mont(a), self.to_mont(b)
            else:
                a, b = self.to_std(a), self.to_std(b)
        if a == b:
            return a
        return self._raw(SEL, c, a, b, self.domain[a])


def _load_bytecode():
    with open(os.path.join(_DATA_DIR, "witgen_accum.bin"), "rb") as f:
        magic, n_ops, n_slots, n_ext, _ = struct.unpack("<4sIIII",
                                                        f.read(20))
        assert magic == b"WGN1"
        ops = np.frombuffer(f.read(n_ops * 20), np.uint32).reshape(n_ops, 5)
        ext = np.frombuffer(f.read(n_ext * 16), np.uint32).reshape(n_ext, 4)
    return ops, int(n_slots), ext


class AccumGraph:
    """Build product: graph + output ids + input specs."""

    def __init__(self, g, out_cols, bad, data_taps, glob_ids, mix_ids):
        self.g = g
        self.out_cols = out_cols      # 103 node ids (Montgomery domain)
        self.bad = bad                # bool node id
        self.data_taps = data_taps    # ordered [(col, back)]
        self.glob_ids = glob_ids      # ordered [col]
        self.mix_ids = mix_ids        # ordered [idx]


def build_accum_graph():
    """If-convert witgen_accum.bin into a predicated dataflow graph."""
    ops, n_slots, extconsts = _load_bytecode()
    n_ops = len(ops)
    g = Graph()

    # basic-block leaders (forward-only jumps — verified acyclic)
    leaders = {0}
    for pc in range(n_ops):
        op, _d, _a, b, _c = ops[pc]
        if op in (B_JZ, B_JMP):
            assert b > pc, "accum CFG must be forward-only"
            leaders.add(int(b))
            leaders.add(pc + 1)
    leaders = sorted(leaders)
    block_of = {lo: i for i, lo in enumerate(leaders)}

    env = {}            # slot -> node id (merged across blocks)
    acc = {}            # accum col -> node id (merged, any domain)
    incoming = {0: [g.TRUE]}
    bad_terms = []

    data_taps, glob_ids, mix_ids = {}, {}, {}

    def in_data(col, back):
        key = (int(col), int(back))
        if key not in data_taps:
            data_taps[key] = g._raw(DATA, key[0], key[1], 0, "s")
        return data_taps[key]

    def in_glob(col):
        col = int(col)
        if col not in glob_ids:
            glob_ids[col] = g._raw(GLOB, col, 0, 0, "s")
        return glob_ids[col]

    def in_mix(idx):
        idx = int(idx)
        if idx not in mix_ids:
            mix_ids[idx] = g._raw(MIXIN, idx, 0, 0, "s")
        return mix_ids[idx]

    for bi, lo in enumerate(leaders):
        hi = leaders[bi + 1] if bi + 1 < len(leaders) else n_ops
        conds = incoming.pop(lo, None)
        if not conds:
            continue   # statically unreachable
        c = conds[0]
        for extra in conds[1:]:
            c = g.bor(c, extra)

        local = {}       # slot -> node (unpredicated, this block)
        acc_local = {}   # col -> node

        def rd(slot):
            slot = int(slot)
            v = local.get(slot)
            if v is None:
                v = env.get(slot)
            if v is None:
                v = g.k(0)   # read-before-write: dead on live paths
            return v

        def wr(slot, v):
            local[int(slot)] = v

        def buf_load(buf, col, back):
            buf, col, back = int(buf), int(col), int(back)
            if buf == 0:
                return in_data(col, back)
            if buf == 1:
                return in_glob(col)
            if buf == 2:
                if back > 0:
                    if col < STATE_COLS:
                        return g._raw(STATE, col, 0, 0, "m")
                    if col > USER_SPLIT:
                        return g.k(0)   # zeroBack guard (witgen.h:118-125)
                    raise NotImplementedError(
                        f"back-read of accum col {col}")
                v = acc_local.get(col)
                if v is None:
                    v = acc.get(col)
                if v is None:
                    v = g.k(0)
                return v
            return in_mix(col)

        def buf_store(buf, col, v):
            assert int(buf) == 2, "accum program stores only to accum"
            acc_local[int(col)] = v

        fallthrough = True
        pc = lo
        while pc < hi:
            op, d, a, b, cc = (int(x) for x in ops[pc])
            if op == CONST:
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
                x = rd(a)
                wr(d, g.sel(g.eq0(x), g.k(1), g.k(0)))
            elif op == B_INV:
                wr(d, g.finv(rd(a)))
            elif op == B_INRANGE:
                lo_v, x, hi_v = (g.to_std(rd(r)) for r in (a, b, cc))
                wr(d, g._raw(INRANGE, lo_v, x, hi_v, "s"))
            elif op == B_LOAD:
                wr(d, buf_load(cc, a, b))
            elif op == B_STORE:
                buf_store(cc, a, rd(b))
            elif op == B_ELOAD:
                for i in range(4):
                    wr(d + i, buf_load(cc, a + i, b))
            elif op == B_ESTORE:
                for i in range(4):
                    buf_store(cc, a + i, rd(b + i))
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
                s = rd(b)
                for i in range(4):
                    wr(d + i, g.fmul(rd(a + i), s))
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
            else:
                raise NotImplementedError(
                    f"accum bytecode op {op} not supported on device")
            pc += 1
        if fallthrough and hi < n_ops:
            incoming.setdefault(hi, []).append(c)

        # merge this block's writes under its path condition
        for slot, v in local.items():
            old = env.get(slot)
            env[slot] = v if old is None and c == g.TRUE else \
                g.sel(c, v, old if old is not None else g.k(0))
        for col, v in acc_local.items():
            old = acc.get(col)
            acc[col] = v if old is None and c == g.TRUE else \
                g.sel(c, v, old if old is not None else g.k(0))

    out_cols = [g.to_mont(acc.get(col, g.k(0))) for col in range(NUM_ACCUM)]
    # balanced OR tree: a linear chain would serialize ~700 levels of the
    # otherwise-shallow graph into singleton device ops
    terms = [t for t in bad_terms if t != g.FALSE] or [g.FALSE]
    while len(terms) > 1:
        terms = [g.bor(terms[i], terms[i + 1]) if i + 1 < len(terms)
                 else terms[i] for i in range(0, len(terms), 2)]
    bad = terms[0]
    taps = sorted(data_taps)
    return AccumGraph(
        g, out_cols, bad,
        data_taps=[(k, data_taps[k]) for k in taps],
        glob_ids=sorted(glob_ids.items()),
        mix_ids=sorted(mix_ids.items()),
    )


_GRAPH = None


def accum_graph():
    global _GRAPH
    if _GRAPH is None:
        _GRAPH = build_accum_graph()
    return _GRAPH


# ---------------------------------------------------------------------------
# numpy executor (reference/testing path)
# ---------------------------------------------------------------------------

def eval_graph_np(ag, data, glob, mix, state_prev):
    """Evaluate the graph over all rows with numpy.

    data: (211, rows) std u32 (INVALID cells tolerated: zeroized).
    glob: (90,) std.  mix: (36,) std.  state_prev: (rows, 12) MONT.
    Returns (accum_mont (103, rows) u32, bad (rows,) bool).
    """
    g = ag.g
    rows = data.shape[1]
    data = np.where(data == INVALID, 0, data)

    vals = {}
    # refcounts for aggressive freeing
    refs = np.zeros(len(g.nodes), np.int64)
    live = set()

    def mark(i):
        if i in live:
            refs[i] += 1
            return
        live.add(i)
        refs[i] += 1
        kind, a, b, c = g.nodes[i]
        if kind in (ADD, SUB, MUL, AND, OR):
            mark(a), mark(b)
        elif kind in (NEG, INV, ENC, DEC, ISZ, NZ, EQZB, NOT):
            mark(a)
        elif kind == INRANGE:
            mark(a), mark(b), mark(c)
        elif kind == SEL:
            mark(a), mark(b), mark(c)

    for i in ag.out_cols:
        mark(i)
    mark(ag.bad)

    def get(i):
        return vals[i]

    def put(i, v):
        vals[i] = v

    def unref(i):
        refs[i] -= 1
        if refs[i] == 0:
            vals.pop(i, None)

    order = sorted(live)
    R2v = np.uint32(F.R2)
    onev = np.uint32(1)
    for i in order:
        kind, a, b, c = g.nodes[i]
        if kind == K:
            put(i, np.uint32(a))
        elif kind == DATA:
            col = data[a]
            put(i, np.roll(col, b) if b else col)
        elif kind == GLOB:
            put(i, np.uint32(glob[a]))
        elif kind == MIXIN:
            put(i, np.uint32(mix[a]))
        elif kind == STATE:
            put(i, state_prev[:, a])
        elif kind == ADD:
            put(i, F.add_np(get(a), get(b))); unref(a); unref(b)
        elif kind == SUB:
            put(i, F.sub_np(get(a), get(b))); unref(a); unref(b)
        elif kind == NEG:
            put(i, F.neg_np(get(a))); unref(a)
        elif kind == MUL:
            put(i, F.mul_np(get(a), get(b))); unref(a); unref(b)
        elif kind == INV:
            put(i, F.inv_np(np.broadcast_to(get(a), (rows,)))); unref(a)
        elif kind == ENC:
            put(i, F.mul_np(get(a), R2v)); unref(a)
        elif kind == DEC:
            put(i, F.mul_np(get(a), onev)); unref(a)
        elif kind == ISZ:
            put(i, (get(a) == 0).astype(np.uint32)); unref(a)
        elif kind == INRANGE:
            lo_v, x, hi_v = get(a), get(b), get(c)
            put(i, ((lo_v <= x) & (x < hi_v)).astype(np.uint32))
            unref(a); unref(b); unref(c)
        elif kind == NZ:
            put(i, get(a) != 0); unref(a)
        elif kind == EQZB:
            put(i, get(a) == 0); unref(a)
        elif kind == AND:
            put(i, get(a) & get(b)); unref(a); unref(b)
        elif kind == OR:
            put(i, get(a) | get(b)); unref(a); unref(b)
        elif kind == NOT:
            put(i, ~get(a)); unref(a)
        elif kind == SEL:
            put(i, np.where(get(a), get(b), get(c)))
            unref(a); unref(b); unref(c)
        else:
            raise AssertionError(kind)

    out = np.empty((NUM_ACCUM, rows), np.uint32)
    for col, i in enumerate(ag.out_cols):
        out[col] = np.broadcast_to(vals[i], (rows,))
    badv = np.broadcast_to(vals[ag.bad], (rows,))
    return out, badv


def _affine_scan_np(c, d):
    """Inclusive scan of s_r = c_r * s_{r-1} + d_r (s_{-1}=0), Montgomery
    ext elements: c, d (rows, 3, 4).  Hillis-Steele composition."""
    C = c.copy()
    D = d.copy()
    rows = c.shape[0]
    off = 1
    while off < rows:
        # F[r] = F[r] o F[r-off]
        c_hi, d_hi = C[off:], D[off:]
        c_lo, d_lo = C[:-off], D[:-off]
        C2 = F.ext_mul_np(c_hi, c_lo)
        D2 = F.add_np(F.ext_mul_np(c_hi, d_lo), d_hi)
        C = np.concatenate([C[:off], C2], axis=0)
        D = np.concatenate([D[:off], D2], axis=0)
        off *= 2
    return D   # s_r = composite applied to 0


def _phases23_np(accum_m, split=USER_SPLIT):
    """Phase 2 (prefix-sum of the last 4 cols) + phase 3 (add prev-row
    totals to machine cols) in Montgomery form, mirroring witgen.py /
    reference ffi.cpp:330-361."""
    rows = accum_m.shape[1]
    for j in range(4):
        col = NUM_ACCUM - 4 + j
        accum_m[col] = _prefix_add_np(accum_m[col])
    machine_cols = (NUM_ACCUM - split) // 4
    prev = np.roll(accum_m[NUM_ACCUM - 4:], 1, axis=1)
    for j in range(machine_cols - 1):
        for k2 in range(4):
            col = split + j * 4 + k2
            accum_m[col] = F.add_np(accum_m[col], prev[k2])
    return accum_m


def _prefix_add_np(col):
    out = col.astype(np.uint64).copy()
    off = 1
    n = len(out)
    while off < n:
        out[off:] = (out[off:] + out[:-off]) % P
        off *= 2
    return out.astype(np.uint32)


def _scan_2x2_np(M, d):
    """Inclusive scan of s_r = M_r s_{r-1} + d_r over 2-vector ext states
    (s_{-1}=0): M (rows, 2, 2, 4) Mont ext, d (rows, 2, 4)."""
    M = M.copy()
    D = d.copy()
    rows = d.shape[0]
    off = 1

    def matmul(A, B):   # (n,2,2,4) x (n,2,2,4)
        out = np.empty_like(A)
        for i in range(2):
            for j in range(2):
                out[:, i, j] = F.add_np(
                    F.ext_mul_np(A[:, i, 0], B[:, 0, j]),
                    F.ext_mul_np(A[:, i, 1], B[:, 1, j]))
        return out

    def matvec(A, v):   # (n,2,2,4) x (n,2,4)
        out = np.empty_like(v)
        for i in range(2):
            out[:, i] = F.add_np(F.ext_mul_np(A[:, i, 0], v[:, 0]),
                                 F.ext_mul_np(A[:, i, 1], v[:, 1]))
        return out

    while off < rows:
        M2, D2 = M[off:], D[off:]
        M1, D1 = M[:-off], D[:-off]
        Mn = matmul(M2, M1)
        Dn = F.add_np(matvec(M2, D1), D2)
        M = np.concatenate([M[:off], Mn], axis=0)
        D = np.concatenate([D[:off], Dn], axis=0)
        off *= 2
    return D


def witgen_accum_np(res, mix):
    """Full device-algorithm accum in numpy (oracle for the jnp path).

    The three accumulator registers are resolved in two stages (the
    zirgen GenerateAccum structure, verified by tests):
      1. regs 0-1 evolve jointly ext-linearly — a 2x2 ext-matrix affine
         scan over two basis probes;
      2. reg 2 is affine in itself GIVEN regs 0-1 (its transition also
         takes a reg0 (x) reg1 bilinear term — the bigint arm), so two
         more probes evaluated at the TRUE prev regs 0-1 recover its
         per-row affine coefficients for a plain affine scan.
    A final evaluation with all true prev-states materializes every
    column.  Returns accum in STANDARD form (103, rows)."""
    ag = accum_graph()
    data = res["data"]
    glob = res["global"]
    rows = res["rows"]
    mix = np.asarray(mix, np.uint32)
    one = np.uint32(F.R % P)

    def ev(state):
        return eval_graph_np(ag, data, glob, mix, state)

    zero = np.zeros((rows, STATE_COLS), np.uint32)
    e0, _ = ev(zero)
    stA = zero.copy(); stA[:, 0] = one
    eA, _ = ev(stA)
    stB = zero.copy(); stB[:, 4] = one
    eB, _ = ev(stB)

    def reg(e, r):
        return e[4 * r:4 * r + 4].T.copy()   # (rows, 4)

    d01 = np.stack([reg(e0, 0), reg(e0, 1)], axis=1)
    M = np.empty((rows, 2, 2, 4), np.uint32)
    for i in range(2):
        M[:, i, 0] = F.sub_np(reg(eA, i), reg(e0, i))
        M[:, i, 1] = F.sub_np(reg(eB, i), reg(e0, i))
    s01 = _scan_2x2_np(M, d01)
    prev01 = np.zeros_like(s01)
    prev01[1:] = s01[:-1]

    stC = zero.copy()
    stC[:, 0:4] = prev01[:, 0]
    stC[:, 4:8] = prev01[:, 1]
    eC, _ = ev(stC)
    stD = stC.copy(); stD[:, 8] = one
    eD, _ = ev(stD)
    d2 = reg(eC, 2).reshape(rows, 1, 4)
    A2 = F.sub_np(reg(eD, 2), reg(eC, 2)).reshape(rows, 1, 4)
    s2 = _affine_scan_np(A2, d2)
    prev2 = np.zeros_like(s2)
    prev2[1:] = s2[:-1]

    state_prev = stC.copy()
    state_prev[:, 8:12] = prev2[:, 0]
    e2, bad = ev(state_prev)
    if bad.any():
        raise RuntimeError(
            f"accum device eval: {int(bad.sum())} rows failed in-circuit "
            "checks (run host witgen_accum for diagnostics)")
    out = _phases23_np(e2)
    return F.decode_np(out)

# ---------------------------------------------------------------------------
# Device (jnp) executor: register-file range plan, one jit for the whole
# probe -> scan -> final -> phases pipeline (trace-cached across processes)
# ---------------------------------------------------------------------------

class ExecPlan:
    """Grouped register-file execution plan for a set of graph outputs."""

    def __init__(self, ag, outputs):
        g = ag.g
        live = set()
        stack = list(outputs)

        def deps(i):
            kind, a, b, c = g.nodes[i]
            if kind in (ADD, SUB, MUL, AND, OR):
                return (a, b)
            if kind in (NEG, INV, ENC, DEC, ISZ, NZ, EQZB, NOT):
                return (a,)
            if kind in (INRANGE, SEL):
                return (a, b, c)
            return ()

        while stack:
            i = stack.pop()
            if i in live:
                continue
            live.add(i)
            stack.extend(deps(i))

        order = sorted(live)
        level = {}
        for i in order:
            ds = deps(i)
            level[i] = 1 + max((level[d] for d in ds), default=0)

        # input rows: consts | taps | scalars(glob+mix) | state
        row = {}
        self.const_vals = []
        consts = [i for i in order if g.nodes[i][0] == K]
        for i in consts:
            row[i] = len(row)
            self.const_vals.append(g.kval(i))
        self.const_vals = np.asarray(self.const_vals, np.uint32)

        # taps: select from the SHARED (len(ag.data_taps), rows) tap matrix
        self.tap_start = len(row)
        tap_pos = {nid: p for p, (_k, nid) in enumerate(ag.data_taps)}
        tap_sel = []
        for i in order:
            if g.nodes[i][0] == DATA:
                row[i] = self.tap_start + len(tap_sel)
                tap_sel.append(tap_pos[i])
        self.tap_sel = np.asarray(tap_sel, np.int32)

        # scalars: shared [glob..., mix...] vector
        self.scal_start = len(row)
        spos = {}
        for p, (_c, nid) in enumerate(ag.glob_ids):
            spos[nid] = p
        off = len(ag.glob_ids)
        for p, (_c, nid) in enumerate(ag.mix_ids):
            spos[nid] = off + p
        scal_sel = []
        for i in order:
            if g.nodes[i][0] in (GLOB, MIXIN):
                row[i] = self.scal_start + len(scal_sel)
                scal_sel.append(spos[i])
        self.scal_sel = np.asarray(scal_sel, np.int32)

        # state rows: fixed 12-row block (input is always (12, chunk))
        self.state_start = len(row)
        state_nodes = [i for i in order if g.nodes[i][0] == STATE]
        state_sel = []
        for i in state_nodes:
            row[i] = self.state_start + len(state_sel)
            state_sel.append(g.nodes[i][1])
        self.state_sel = np.asarray(state_sel, np.int32)

        # computed nodes: contiguous rows per (level, kind) group
        groups = {}
        for i in order:
            kind = g.nodes[i][0]
            if kind in (K, DATA, GLOB, MIXIN, STATE):
                continue
            groups.setdefault((level[i], kind), []).append(i)

        self.groups = []
        for (lv, kind), members in sorted(groups.items()):
            dst = len(row)
            for i in members:
                row[i] = len(row)
            opnds = []
            n_ops = {ADD: 2, SUB: 2, MUL: 2, AND: 2, OR: 2, NEG: 1, INV: 1,
                     ENC: 1, DEC: 1, ISZ: 1, NZ: 1, EQZB: 1, NOT: 1,
                     INRANGE: 3, SEL: 3}[kind]
            for slot in range(n_ops):
                opnds.append(np.asarray(
                    [row[deps(i)[slot]] for i in members], np.int32))
            self.groups.append((kind, dst, len(members), opnds))

        self.n_rows = len(row)
        self.out_rows = np.asarray([row[i] for i in outputs], np.int32)


def _group_compute(kind, ops):
    import jax.numpy as jnp

    if kind == ADD:
        return F.add(ops[0], ops[1])
    if kind == SUB:
        return F.sub(ops[0], ops[1])
    if kind == MUL:
        return F.mul(ops[0], ops[1])
    if kind == NEG:
        return F.neg(ops[0])
    if kind == INV:
        return F.inv(ops[0])
    if kind == ENC:
        return F.encode(ops[0])
    if kind == DEC:
        return F.decode(ops[0])
    if kind == ISZ:
        return (ops[0] == 0).astype(jnp.uint32)
    if kind == INRANGE:
        return ((ops[0] <= ops[1]) & (ops[1] < ops[2])).astype(jnp.uint32)
    if kind == NZ:
        return (ops[0] != 0).astype(jnp.uint32)
    if kind == EQZB:
        return (ops[0] == 0).astype(jnp.uint32)
    if kind == AND:
        return ops[0] & ops[1]
    if kind == OR:
        return ops[0] | ops[1]
    if kind == NOT:
        return ops[0] ^ jnp.uint32(1)
    if kind == SEL:
        return jnp.where(ops[0] != 0, ops[1], ops[2])
    raise AssertionError(kind)


def _run_plan(plan, taps, scalars, state, chunk):
    """Evaluate a plan over all rows with a fori_loop of register-file
    chunks.  taps: (n_taps, rows) u32.  scalars: (ns,) u32.
    state: (12, rows) u32 Montgomery.  Returns (n_out, rows)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rows = taps.shape[1]
    n_chunks = rows // chunk
    consts = jnp.asarray(plan.const_vals)
    nk = len(plan.const_vals)
    out = jnp.zeros((len(plan.out_rows), rows), jnp.uint32)

    def body(i, out):
        t = lax.dynamic_slice(taps, (0, i * chunk), (taps.shape[0], chunk))
        s = lax.dynamic_slice(state, (0, i * chunk), (12, chunk))
        file = jnp.zeros((plan.n_rows, chunk), jnp.uint32)
        file = lax.dynamic_update_slice(
            file, jnp.broadcast_to(consts[:, None], (nk, chunk)), (0, 0))
        file = lax.dynamic_update_slice(
            file, t[plan.tap_sel], (plan.tap_start, 0))
        file = lax.dynamic_update_slice(
            file, jnp.broadcast_to(scalars[plan.scal_sel][:, None],
                                   (len(plan.scal_sel), chunk)),
            (plan.scal_start, 0))
        file = lax.dynamic_update_slice(
            file, s[plan.state_sel], (plan.state_start, 0))
        for kind, dst, _n, opnds in plan.groups:
            vals = _group_compute(kind, [file[ix] for ix in opnds])
            file = lax.dynamic_update_slice(file, vals, (dst, 0))
        return lax.dynamic_update_slice(
            out, file[plan.out_rows], (0, i * chunk))

    return jax.lax.fori_loop(0, n_chunks, body, out)


_PLANS = {}


def _plans():
    if not _PLANS:
        ag = accum_graph()
        _PLANS["ag"] = ag
        _PLANS["probe"] = ExecPlan(ag, ag.out_cols[:STATE_COLS])
        _PLANS["full"] = ExecPlan(ag, ag.out_cols + [ag.bad])
    return _PLANS


def _accum_pipeline(taps, scalars, chunk):
    """The full device accum (staged scans — see witgen_accum_np):
    regs 0-1 via a 2x2 ext-matrix affine associative_scan, reg 2 via a
    plain affine scan with probes evaluated at the true regs 0-1.

    Returns (accum (103, rows) Montgomery u32, bad_rows scalar u32)."""
    import jax.numpy as jnp
    from jax import lax

    plans = _plans()
    rows = taps.shape[1]
    mont_one = jnp.uint32(F.R % P)

    zero_state = jnp.zeros((12, rows), jnp.uint32)
    e0 = _run_plan(plans["probe"], taps, scalars, zero_state, chunk)
    eA = _run_plan(plans["probe"], taps, scalars,
                   zero_state.at[0].set(mont_one), chunk)
    eB = _run_plan(plans["probe"], taps, scalars,
                   zero_state.at[4].set(mont_one), chunk)

    def reg(e, r):
        return e[4 * r:4 * r + 4].T   # (rows, 4)

    d01 = jnp.stack([reg(e0, 0), reg(e0, 1)], axis=1)
    M = jnp.stack([
        jnp.stack([F.sub(reg(eA, 0), reg(e0, 0)),
                   F.sub(reg(eB, 0), reg(e0, 0))], axis=1),
        jnp.stack([F.sub(reg(eA, 1), reg(e0, 1)),
                   F.sub(reg(eB, 1), reg(e0, 1))], axis=1),
    ], axis=1)   # (rows, 2(out), 2(in), 4)

    def mat_compose(lo, hi):
        M1, D1 = lo
        M2, D2 = hi

        def mm(A, B):
            cols = []
            for j in range(2):
                cols.append(jnp.stack([
                    F.add(F.ext_mul(A[:, i, 0], B[:, 0, j]),
                          F.ext_mul(A[:, i, 1], B[:, 1, j]))
                    for i in range(2)], axis=1))
            return jnp.stack(cols, axis=2)

        def mv(A, v):
            return jnp.stack([
                F.add(F.ext_mul(A[:, i, 0], v[:, 0]),
                      F.ext_mul(A[:, i, 1], v[:, 1]))
                for i in range(2)], axis=1)

        return mm(M2, M1), F.add(mv(M2, D1), D2)

    _, s01 = lax.associative_scan(mat_compose, (M, d01), axis=0)
    prev01 = jnp.concatenate(
        [jnp.zeros((1, 2, 4), jnp.uint32), s01[:-1]], axis=0)

    stC = jnp.concatenate(
        [prev01.reshape(rows, 8), jnp.zeros((rows, 4), jnp.uint32)],
        axis=1).T
    eC = _run_plan(plans["probe"], taps, scalars, stC, chunk)
    eD = _run_plan(plans["probe"], taps, scalars,
                   stC.at[8].set(mont_one), chunk)
    d2 = reg(eC, 2)
    A2 = F.sub(reg(eD, 2), reg(eC, 2))

    def compose(lo, hi):
        c1, d1 = lo
        c2, d2_ = hi
        return F.ext_mul(c2, c1), F.add(F.ext_mul(c2, d1), d2_)

    _, s2 = lax.associative_scan(compose, (A2, d2), axis=0)
    prev2 = jnp.concatenate(
        [jnp.zeros((1, 4), jnp.uint32), s2[:-1]], axis=0)

    state_prev = jnp.concatenate(
        [prev01.reshape(rows, 8), prev2], axis=1).T
    e2 = _run_plan(plans["full"], taps, scalars, state_prev, chunk)
    accum, bad = e2[:NUM_ACCUM], e2[NUM_ACCUM]

    # phase 2: inclusive prefix-sum of the last 4 columns (ffi.cpp:330-339)
    totals = lax.associative_scan(F.add, accum[NUM_ACCUM - 4:], axis=1)
    prev = jnp.roll(totals, 1, axis=1)
    # phase 3: add prev-row totals to all but the last machine ext group
    machine = (NUM_ACCUM - USER_SPLIT) // 4
    fix = jnp.tile(prev, (machine - 1, 1))
    accum = jnp.concatenate([
        accum[:USER_SPLIT],
        F.add(accum[USER_SPLIT:NUM_ACCUM - 4], fix),
        totals,
    ], axis=0)
    return accum, jnp.sum(bad, dtype=jnp.uint32)


_DEVICE_FNS = {}


def witgen_accum_device(res, mix, chunk=2048):
    """Device accum witgen.  Returns ((103, rows) MONTGOMERY device array).

    Raises RuntimeError when in-circuit checks fail (fall back to the host
    witgen_accum for row/loc diagnostics)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from ...hal.trace_cache import TraceCached, fingerprint

    plans = _plans()
    ag = plans["ag"]
    rows = res["rows"]
    cols = sorted({c for c, _b in (k for k, _n in ag.data_taps)})
    col_idx = {c: p for p, c in enumerate(cols)}
    data = res["data"]
    if isinstance(data, np.ndarray):
        data_sel = np.ascontiguousarray(data[cols])
    else:
        # device-resident witness (exec_device path): gather on device,
        # no host round-trip
        import jax.numpy as jnp
        data_sel = data[jnp.asarray(cols)]

    assert all(b in (0, 1) for (_c, b), _n in ag.data_taps), \
        "device accum tap builder only handles back offsets 0/1"
    key = (rows, chunk)
    fn = _DEVICE_FNS.get(key)
    if fn is None:
        b0 = np.asarray([col_idx[c] for (c, b), _n in ag.data_taps
                         if b == 0], np.int32)
        b1 = np.asarray([col_idx[c] for (c, b), _n in ag.data_taps
                         if b == 1], np.int32)
        order = np.argsort(np.concatenate([
            np.flatnonzero([b == 0 for (_c, b), _n in ag.data_taps]),
            np.flatnonzero([b == 1 for (_c, b), _n in ag.data_taps])]))

        @partial(jax.jit, static_argnames=())
        def run(data_sel, scalars):
            dsel = jnp.where(data_sel == INVALID, 0, data_sel)
            taps = jnp.concatenate(
                [dsel[b0], jnp.roll(dsel[b1], 1, axis=1)], axis=0)[order]
            return _accum_pipeline(taps, scalars, chunk)

        fn = TraceCached(run, key=fingerprint(
            "accum_device", rows, chunk, len(ag.g.nodes),
            [int(x) for x in plans["full"].out_rows]),
            label=f"accum_dev_{rows}")
        _DEVICE_FNS[key] = fn

    scalars = np.concatenate([
        np.asarray([res["global"][c] for c, _n in ag.glob_ids], np.uint32),
        np.asarray([mix[i] for i, _n in ag.mix_ids], np.uint32)])
    accum, bad = fn(data_sel, scalars)
    if int(np.asarray(bad)) != 0:
        raise RuntimeError(
            f"accum device eval: {int(np.asarray(bad))} rows failed "
            "in-circuit checks (run host witgen_accum for diagnostics)")
    return accum
