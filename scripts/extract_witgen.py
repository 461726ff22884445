#!/usr/bin/env python3
"""Extract the reference's generated rv32im witness generator into bytecode.

The reference circuit ships generated C++ witgen code (zirgen output:
risc0/circuit/rv32im-sys/kernels/cxx/{steps.cpp,types.h.inc,layout.cpp.inc})
that fills the data/accum trace columns from a preflight trace.  Like the
poly_fp / PolyExtStep extractions, we treat the *generated* artifact as
circuit data: this script partially evaluates the C++ subset (layouts are
compile-time constants, structs/arrays/calls/map/reduce disappear at extract
time) into a flat register bytecode with jumps for the one-hot mux arms.
The bytecode is executed by csrc/witgen.cpp row-parallel, mirroring the
reference driver (kernels/cxx/ffi.cpp risc0_circuit_rv32im_cpu_witgen).

Output: risc0_tpu/circuit/rv32im/data/witgen.bin + witgen_meta.json
"""

import json
import os
import re
import struct
import sys

REF = "/root/reference/risc0/circuit/rv32im-sys/kernels/cxx"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "risc0_tpu", "circuit", "rv32im", "data")

# ---------------------------------------------------------------------------
# Lexer
# ---------------------------------------------------------------------------

TOKEN_RE = re.compile(r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/|\#[^\n]*)
  | (?P<num>0x[0-9a-fA-F]+|\d+)
  | (?P<id>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<punct>::|&&|\|\||==|!=|[{}()\[\].,;=+\-*<>&:~!%|^/?])
""", re.VERBOSE | re.DOTALL)


def tokenize(src):
    toks = []
    pos = 0
    n = len(src)
    while pos < n:
        m = TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError(f"lex error at {src[pos:pos+60]!r}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        toks.append((m.lastgroup, m.group()))
    toks.append(("eof", ""))
    return toks


class TokStream:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        return self.toks[self.i + k]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text):
        t = self.next()
        if t[1] != text:
            raise SyntaxError(f"expected {text!r}, got {t!r} near "
                              f"{[x[1] for x in self.toks[self.i-3:self.i+5]]}")
        return t

    def accept(self, text):
        if self.peek()[1] == text:
            self.next()
            return True
        return False


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------
# Expressions are tuples:
#   ('num', int) ('str', s) ('var', name) ('bin', op, a, b) ('neg', a)
#   ('call', nameexpr, [args]) ('member', a, name) ('index', a, e)
#   ('slit', typename, [(field|None, expr)])   struct/array literal
#   ('lambda', [params], [stmts])
# Statements:
#   ('decl', type, name, expr|None) ('assign', name, expr)
#   ('expr', expr) ('return', expr|None) ('if', [(cond|None, [stmts])])
#   ('unreachable',)

def parse_expr(ts):
    return parse_addsub(ts)


def parse_addsub(ts):
    e = parse_mul(ts)
    while ts.peek()[1] in ("+", "-"):
        op = ts.next()[1]
        e = ("bin", op, e, parse_mul(ts))
    return e


def parse_mul(ts):
    e = parse_unary(ts)
    while ts.peek()[1] == "*":
        ts.next()
        e = ("bin", "*", e, parse_unary(ts))
    return e


def parse_unary(ts):
    if ts.peek()[1] == "-":
        ts.next()
        return ("neg", parse_unary(ts))
    return parse_postfix(ts)


def parse_postfix(ts):
    e = parse_primary(ts)
    while True:
        t = ts.peek()[1]
        if t == ".":
            ts.next()
            e = ("member", e, ts.next()[1])
        elif t == "[":
            ts.next()
            idx = parse_expr(ts)
            ts.expect("]")
            e = ("index", e, idx)
        elif t == "(":
            ts.next()
            args = []
            if ts.peek()[1] != ")":
                args.append(parse_expr(ts))
                while ts.accept(","):
                    args.append(parse_expr(ts))
            ts.expect(")")
            e = ("call", e, args)
        else:
            return e


def parse_primary(ts):
    kind, text = ts.peek()
    if text == "(":
        ts.next()
        # lambda: ([&](params) { stmts })
        if ts.peek()[1] == "[" and ts.peek(1)[1] == "&":
            ts.next(); ts.expect("&"); ts.expect("]")
            ts.expect("(")
            params = []
            while ts.peek()[1] != ")":
                # type tokens then name; type may contain :: < > &
                toks = []
                depth = 0
                while True:
                    t = ts.peek()
                    if depth == 0 and t[1] in (",", ")"):
                        break
                    if t[1] == "<":
                        depth += 1
                    if t[1] == ">":
                        depth -= 1
                    toks.append(ts.next())
                params.append(toks[-1][1])  # last ident is the param name
                ts.accept(",")
            ts.expect(")")
            ts.expect("{")
            body = parse_stmts(ts)
            ts.expect("}")
            ts.expect(")")
            return ("lambda", params, body)
        e = parse_expr(ts)
        ts.expect(")")
        return e
    if kind == "num":
        ts.next()
        return ("num", int(text, 0))
    if kind == "str":
        ts.next()
        return ("str", text[1:-1])
    if kind == "id":
        # identifier path (with :: and template args dropped)
        name = ts.next()[1]
        while ts.peek()[1] == "::":
            ts.next()
            name += "::" + ts.next()[1]
        if ts.peek()[1] == "<":
            # template args on a type path: skip balanced <...>
            depth = 0
            while True:
                t = ts.next()[1]
                if t == "<":
                    depth += 1
                elif t == ">":
                    depth -= 1
                    if depth == 0:
                        break
            while ts.peek()[1] == "::":
                ts.next()
                name += "::" + ts.next()[1]
        if ts.peek()[1] == "{":
            ts.next()
            inits = []
            while ts.peek()[1] != "}":
                if ts.peek()[1] == ".":
                    ts.next()
                    f = ts.next()[1]
                    ts.expect("=")
                    inits.append((f, parse_expr(ts)))
                else:
                    inits.append((None, parse_expr(ts)))
                ts.accept(",")
            ts.expect("}")
            return ("slit", name, inits)
        return ("var", name)
    raise SyntaxError(f"unexpected token {ts.peek()!r}")


def parse_stmts(ts):
    stmts = []
    while ts.peek()[1] not in ("}", ""):
        stmts.append(parse_stmt(ts))
    return stmts


def _skip_type(ts):
    """Consume a type: idents with ::, <...>, &."""
    ts.next()
    while True:
        t = ts.peek()[1]
        if t == "<":
            depth = 0
            while True:
                t2 = ts.next()[1]
                if t2 == "<":
                    depth += 1
                elif t2 == ">":
                    depth -= 1
                    if depth == 0:
                        break
        elif t in ("::",):
            ts.next()
            ts.next()
        elif t == "&":
            ts.next()
        else:
            return


def parse_stmt(ts):
    kind, text = ts.peek()
    if text == "auto" and ts.peek(1)[1] == "[":
        ts.next()
        ts.expect("[")
        names = [ts.next()[1]]
        while ts.accept(","):
            names.append(ts.next()[1])
        ts.expect("]")
        ts.expect("=")
        e = parse_expr(ts)
        ts.expect(";")
        return ("declmulti", names, e)
    if text == "if":
        return parse_if(ts)
    if text == "return":
        ts.next()
        if ts.peek()[1] == ";":
            ts.next()
            return ("return", None)
        e = parse_expr(ts)
        ts.expect(";")
        return ("return", e)
    if text == "assert":
        # assert(0 && "Reached unreachable mux arm");
        while ts.next()[1] != ";":
            pass
        return ("unreachable",)
    # Type name [= expr] ;  |  name = expr ;  |  callstmt ;
    # decide: id id  => decl;  id = => assign;  else expression stmt
    if kind == "id" and ts.peek(1)[0] == "id":
        _skip_type(ts)
        name = ts.next()[1]
        if ts.accept(";"):
            return ("decl", None, name, None)
        ts.expect("=")
        e = parse_expr(ts)
        ts.expect(";")
        return ("decl", None, name, e)
    if kind == "id" and ts.peek(1)[1] == "<":
        _skip_type(ts)
        name = ts.next()[1]
        if ts.accept(";"):
            return ("decl", None, name, None)
        ts.expect("=")
        e = parse_expr(ts)
        ts.expect(";")
        return ("decl", None, name, e)
    if kind == "id" and ts.peek(1)[1] == "=":
        name = ts.next()[1]
        ts.next()
        e = parse_expr(ts)
        ts.expect(";")
        return ("assign", name, e)
    e = parse_expr(ts)
    ts.expect(";")
    return ("expr", e)


def parse_if(ts):
    arms = []
    ts.expect("if")
    ts.expect("(")
    cond = parse_expr(ts)
    ts.expect(")")
    ts.expect("{")
    body = parse_stmts(ts)
    ts.expect("}")
    arms.append((cond, body))
    while ts.peek()[1] == "else":
        ts.next()
        if ts.peek()[1] == "if":
            ts.next()
            ts.expect("(")
            cond = parse_expr(ts)
            ts.expect(")")
            ts.expect("{")
            body = parse_stmts(ts)
            ts.expect("}")
            arms.append((cond, body))
        else:
            ts.expect("{")
            body = parse_stmts(ts)
            ts.expect("}")
            arms.append((None, body))
            break
    return ("if", arms)


# ---------------------------------------------------------------------------
# Parse functions out of steps.cpp
# ---------------------------------------------------------------------------

def parse_functions(src):
    """Return {name: (params, stmts)}; params is a list of names."""
    ts = TokStream(tokenize(src))
    fns = {}
    while ts.peek()[0] != "eof":
        # skip until a function signature:  Type name ( ExecContext & ctx ...
        if ts.peek()[0] != "id":
            ts.next()
            continue
        save = ts.i
        try:
            _skip_type(ts)
            if ts.peek()[0] != "id" or ts.peek(1)[1] != "(":
                ts.i = save + 1
                continue
            name = ts.next()[1]
            ts.expect("(")
            params = []
            while ts.peek()[1] != ")":
                _skip_type(ts)
                params.append(ts.next()[1])
                ts.accept(",")
            ts.expect(")")
            ts.expect("{")
            body = parse_stmts(ts)
            ts.expect("}")
            fns[name] = (params, body)
        except SyntaxError:
            ts.i = save + 1
    return fns


# ---------------------------------------------------------------------------
# Layout constants (layout.cpp.inc)
# ---------------------------------------------------------------------------

def parse_layouts(src):
    ts = TokStream(tokenize(src))
    env = {}

    def ev(e):
        k = e[0]
        if k == "num":
            return e[1]
        if k == "neg":
            return -ev(e[2] if len(e) > 2 else e[1])
        if k == "var":
            return env[e[1]]
        if k == "slit":
            fields = e[2]
            if fields and fields[0][0] is not None:
                return {f: ev(x) for f, x in fields}
            if not fields:
                return {}
            return [ev(x) for _, x in fields]
        if k == "call":  # e.g. NondetRegLayout{...} never; Reg(12) unlikely
            return ev(e[2][0])
        raise ValueError(f"layout eval: {e}")

    while ts.peek()[0] != "eof":
        if ts.peek()[1] != "constexpr":
            ts.next()
            continue
        ts.next()
        _skip_type(ts)
        name = ts.next()[1]
        ts.expect("=")
        val = parse_expr(ts)
        ts.expect(";")
        env[name] = ev(val)
    return env


# ---------------------------------------------------------------------------
# Bytecode emitter
# ---------------------------------------------------------------------------

OPS = {name: i for i, name in enumerate([
    "CONST", "ADD", "SUB", "MUL", "NEG", "ISZ", "INV", "BITAND", "MOD",
    "INRANGE", "LOAD", "STORE", "ELOAD", "ESTORE", "EADD", "ESUB", "EMUL",
    "EINV", "EMULS", "EFROMVAL", "ECONST", "EEQZ", "MOV", "EMOV", "EQZ",
    "JZ", "JMP", "UNREACHABLE",
    "X_GET_MAJOR_MINOR", "X_GET_MEM_TXN", "X_LOOKUP_DELTA",
    "X_LOOKUP_CURRENT", "X_MEMORY_DELTA", "X_GET_DIFF_COUNT",
    "X_IS_FIRST_CYCLE", "X_DIVIDE", "X_HOST_READ_PREPARE", "X_HOST_WRITE",
    "X_NEXT_PAGING_IDX", "X_BIGINT_EXTERN", "NOP",
    "GET_CYCLE", "K_GET_PREIMAGE", "K_NEXT_PREIMAGE",
])}

BUF_DATA, BUF_GLOBAL, BUF_ACCUM, BUF_MIX = 0, 1, 2, 3


class Val:
    """Scalar SSA reference."""
    __slots__ = ("slot",)

    def __init__(self, slot):
        self.slot = slot


class Ext:
    """Ext SSA reference: 4 consecutive slots starting at slot."""
    __slots__ = ("slot",)

    def __init__(self, slot):
        self.slot = slot


class Bound:
    """BoundLayout: (buffer id, layout subtree)."""
    __slots__ = ("buf", "layout")

    def __init__(self, buf, layout):
        self.buf = buf
        self.layout = layout


class Unset:
    pass


class Emitter:
    def __init__(self):
        self.ops = []        # list of [op, dst, a, b, c]
        self.n_slots = 0
        self.extconsts = []
        self.extconst_ids = {}
        self.locs = []
        self.loc_ids = {}

    def slot(self, n=1):
        s = self.n_slots
        self.n_slots += n
        return s

    def emit(self, op, dst=0, a=0, b=0, c=0):
        self.ops.append([OPS[op], dst, a, b, c])
        return len(self.ops) - 1

    def const(self, v):
        d = self.slot()
        self.emit("CONST", d, v % 2013265921)
        return Val(d)

    def econst(self, vals):
        key = tuple(v % 2013265921 for v in vals)
        if key not in self.extconst_ids:
            self.extconst_ids[key] = len(self.extconsts)
            self.extconsts.append(key)
        d = self.slot(4)
        self.emit("ECONST", d, self.extconst_ids[key])
        return Ext(d)

    def loc(self, s):
        if s not in self.loc_ids:
            self.loc_ids[s] = len(self.locs)
            self.locs.append(s)
        return self.loc_ids[s]


# ---------------------------------------------------------------------------
# Partial evaluator
# ---------------------------------------------------------------------------

class Evaluator:
    def __init__(self, fns, layouts):
        self.fns = fns
        self.layouts = layouts
        self.em = Emitter()

    # -- value helpers ------------------------------------------------------
    def as_val(self, v):
        if isinstance(v, Val):
            return v
        if isinstance(v, int):
            return self.em.const(v)
        raise TypeError(f"not a scalar: {v!r}")

    def as_ext(self, v):
        if isinstance(v, Ext):
            return v
        v = self.as_val(v)
        d = self.em.slot(4)
        self.em.emit("EFROMVAL", d, v.slot)
        return Ext(d)

    def binop(self, op, a, b):
        if isinstance(a, int) and isinstance(b, int):
            p = 2013265921
            if op == "+":
                return (a + b) % p
            if op == "-":
                return (a - b) % p
            return (a * b) % p
        ea = isinstance(a, Ext)
        eb = isinstance(b, Ext)
        if ea or eb:
            if op == "*" and ea != eb:
                s = self.as_val(b if ea else a)
                e = a if ea else b
                d = self.em.slot(4)
                self.em.emit("EMULS", d, e.slot, s.slot)
                return Ext(d)
            a = self.as_ext(a)
            b = self.as_ext(b)
            d = self.em.slot(4)
            self.em.emit({"+": "EADD", "-": "ESUB", "*": "EMUL"}[op],
                         d, a.slot, b.slot)
            return Ext(d)
        a = self.as_val(a)
        b = self.as_val(b)
        d = self.em.slot()
        self.em.emit({"+": "ADD", "-": "SUB", "*": "MUL"}[op],
                     d, a.slot, b.slot)
        return Val(d)

    # -- layout path --------------------------------------------------------
    def layout_path(self, bound, path_expr, env):
        """LAYOUT_LOOKUP(orig, a.b[i].c) -> Bound with sub-layout."""
        def walk(e):
            if e[0] == "var":
                base = env[e[1]]
                assert isinstance(base, Bound), e
                return base.buf, base.layout
            if e[0] == "member":
                buf, lay = walk(e[1])
                return buf, lay[e[2]]
            if e[0] == "index":
                buf, lay = walk(e[1])
                idx = self.eval_expr(e[2], env)
                assert isinstance(idx, int)
                return buf, lay[idx]
            raise ValueError(f"layout path: {e}")
        buf, lay = walk(("member", ("var", "__b__"), "__x__")) \
            if False else (None, None)
        # path_expr is relative to bound
        def walk_rel(e):
            if e[0] == "var":
                return bound.layout[e[1]]
            if e[0] == "member":
                return walk_rel(e[1])[e[2]]
            if e[0] == "index":
                idx = self.eval_expr(e[2], env)
                return walk_rel(e[1])[idx]
            raise ValueError(f"layout path: {e}")
        return Bound(bound.buf, walk_rel(path_expr))

    # -- expression evaluation ----------------------------------------------
    def eval_expr(self, e, env):
        k = e[0]
        if k == "num":
            return e[1]
        if k == "str":
            return e[1]
        if k == "var":
            name = e[1]
            if name in env:
                return env[name]
            if name in self.layouts:
                return self.layouts[name]
            raise NameError(name)
        if k == "neg":
            v = self.eval_expr(e[1], env)
            if isinstance(v, int):
                return (-v) % 2013265921
            if isinstance(v, Ext):
                z = self.em.econst((0, 0, 0, 0))
                d = self.em.slot(4)
                self.em.emit("ESUB", d, z.slot, v.slot)
                return Ext(d)
            v = self.as_val(v)
            d = self.em.slot()
            self.em.emit("NEG", d, v.slot)
            return Val(d)
        if k == "bin":
            return self.binop(e[1], self.eval_expr(e[2], env),
                              self.eval_expr(e[3], env))
        if k == "member":
            base = self.eval_expr(e[1], env)
            return base[e[2]]
        if k == "index":
            base = self.eval_expr(e[1], env)
            idx = self.eval_expr(e[2], env)
            assert isinstance(idx, int)
            return base[idx]
        if k == "slit":
            name = e[1]
            fields = e[2]
            if name == "ExtVal" or name.startswith("ExtVal"):
                pass  # handled via call below for ExtVal(a,b,c,d)
            if fields and fields[0][0] is not None:
                return {f: self.eval_expr(x, env) for f, x in fields}
            if not fields:
                return {}
            return [self.eval_expr(x, env) for _, x in fields]
        if k == "call":
            return self.eval_call(e[1], e[2], env)
        if k == "lambda":
            return ("lambda", e[1], e[2], env)
        raise ValueError(f"eval: {e}")

    def eval_call(self, fn_expr, args, env):
        if fn_expr[0] != "var":
            raise ValueError(f"call target: {fn_expr}")
        name = fn_expr[1]

        if name == "Val":
            v = self.eval_expr(args[0], env)
            return v if isinstance(v, (int, Val)) else self.as_val(v)
        if name == "ExtVal":
            vals = [self.eval_expr(a, env) for a in args]
            assert all(isinstance(v, int) for v in vals)
            return self.em.econst(vals)
        if name == "to_size_t":
            return self.eval_expr(args[0], env)
        if name == "isz":
            v = self.as_val(self.eval_expr(args[0], env))
            d = self.em.slot()
            self.em.emit("ISZ", d, v.slot)
            return Val(d)
        if name in ("neg_0",):
            return self.eval_expr(("neg", args[0]), env)
        if name == "inv_0":
            v = self.eval_expr(args[0], env)
            if isinstance(v, Ext):
                d = self.em.slot(4)
                self.em.emit("EINV", d, v.slot)
                return Ext(d)
            v = self.as_val(v)
            d = self.em.slot()
            self.em.emit("INV", d, v.slot)
            return Val(d)
        if name == "bitAnd":
            a = self.as_val(self.eval_expr(args[0], env))
            b = self.as_val(self.eval_expr(args[1], env))
            d = self.em.slot()
            self.em.emit("BITAND", d, a.slot, b.slot)
            return Val(d)
        if name == "mod":
            a = self.as_val(self.eval_expr(args[0], env))
            b = self.as_val(self.eval_expr(args[1], env))
            d = self.em.slot()
            self.em.emit("MOD", d, a.slot, b.slot)
            return Val(d)
        if name == "inRange":
            a = self.as_val(self.eval_expr(args[0], env))
            b = self.as_val(self.eval_expr(args[1], env))
            c = self.as_val(self.eval_expr(args[2], env))
            d = self.em.slot()
            self.em.emit("INRANGE", d, a.slot, b.slot, c.slot)
            return Val(d)
        if name == "BIND_LAYOUT":
            lay = self.eval_expr(args[0], env)
            buf = env[args[1][1]]
            assert isinstance(buf, int), buf  # buffer id
            return Bound(buf, lay)
        if name == "LAYOUT_LOOKUP":
            bound = self.eval_expr(args[0], env)
            return self.layout_path(bound, args[1], env)
        if name == "LAYOUT_SUBSCRIPT":
            bound = self.eval_expr(args[0], env)
            idx = self.eval_expr(args[1], env)
            return Bound(bound.buf, bound.layout[idx])
        if name == "LOAD":
            bound = self.eval_expr(args[0], env)
            back = self.eval_expr(args[1], env)
            col = bound.layout
            assert isinstance(col, int) and isinstance(back, int)
            d = self.em.slot()
            self.em.emit("LOAD", d, col, back, bound.buf)
            return Val(d)
        if name == "LOAD_EXT":
            bound = self.eval_expr(args[0], env)
            back = self.eval_expr(args[1], env)
            d = self.em.slot(4)
            self.em.emit("ELOAD", d, bound.layout, back, bound.buf)
            return Ext(d)
        if name == "STORE":
            bound = self.eval_expr(args[0], env)
            v = self.as_val(self.eval_expr(args[1], env))
            self.em.emit("STORE", 0, bound.layout, v.slot, bound.buf)
            return None
        if name == "STORE_EXT":
            bound = self.eval_expr(args[0], env)
            v = self.as_ext(self.eval_expr(args[1], env))
            self.em.emit("ESTORE", 0, bound.layout, v.slot, bound.buf)
            return None
        if name == "EQZ":
            v = self.eval_expr(args[0], env)
            loc = self.eval_expr(args[1], env)
            lid = self.em.loc(loc)
            if isinstance(v, Ext):
                self.em.emit("EEQZ", 0, v.slot, lid)
            elif isinstance(v, int):
                if v % 2013265921 != 0:
                    # intentional die-arm (e.g. IllegalMulOp): fails if reached
                    cv = self.em.const(v)
                    self.em.emit("EQZ", 0, cv.slot, lid)
            else:
                self.em.emit("EQZ", 0, v.slot, lid)
            return None
        if name == "INVOKE_EXTERN":
            return self.eval_extern(args, env)
        if name == "set":
            buf = env[args[1][1]]
            col = self.eval_expr(args[2], env)
            v = self.as_val(self.eval_expr(args[3], env))
            self.em.emit("STORE", 0, col, v.slot, buf)
            return None
        if name == "get":
            buf = env[args[1][1]]
            col = self.eval_expr(args[2], env)
            back = self.eval_expr(args[3], env)
            d = self.em.slot()
            self.em.emit("LOAD", d, col, back, buf)
            return Val(d)
        if name == "setGlobal":
            buf = env[args[1][1]]
            col = self.eval_expr(args[2], env)
            v = self.as_val(self.eval_expr(args[3], env))
            self.em.emit("STORE", 0, col, v.slot, buf)
            return None
        if name == "getGlobal":
            buf = env[args[1][1]]
            col = self.eval_expr(args[2], env)
            d = self.em.slot()
            self.em.emit("LOAD", d, col, 0, buf)
            return Val(d)
        if name == "map":
            return self.eval_map(args, env)
        if name == "reduce":
            return self.eval_reduce(args, env)
        if name in self.fns:
            params, body = self.fns[name]
            real_args = [a for a in args if a != ("var", "ctx")]
            vals = [self.eval_expr(a, env) for a in real_args]
            local = {}
            pi = 0
            for p in params:
                if p == "ctx":
                    local[p] = None
                    continue
                local[p] = vals[pi]
                pi += 1
            assert pi == len(vals), (name, params, len(vals))
            return self.eval_body(body, local)
        raise NameError(f"unknown function {name}")

    def eval_extern(self, args, env):
        # args[0] is ctx, args[1] is the extern name identifier
        name = args[1][1]
        rest = [self.eval_expr(a, env) for a in args[2:]]
        em = self.em
        if name == "getMajorMinor":
            d = em.slot(2)
            em.emit("X_GET_MAJOR_MINOR", d)
            return [Val(d), Val(d + 1)]
        if name == "getMemoryTxn":
            a = self.as_val(rest[0])
            d = em.slot(5)
            em.emit("X_GET_MEM_TXN", d, a.slot)
            return [Val(d + i) for i in range(5)]
        if name == "lookupDelta":
            t = self.as_val(rest[0]); i = self.as_val(rest[1])
            c = self.as_val(rest[2])
            em.emit("X_LOOKUP_DELTA", 0, t.slot, i.slot, c.slot)
            return None
        if name == "lookupCurrent":
            t = self.as_val(rest[0]); i = self.as_val(rest[1])
            d = em.slot()
            em.emit("X_LOOKUP_CURRENT", d, t.slot, i.slot)
            return Val(d)
        if name == "memoryDelta":
            return None  # no-op in reference ffi.cpp:106
        if name == "getDiffCount":
            a = self.as_val(rest[0])
            d = em.slot()
            em.emit("X_GET_DIFF_COUNT", d, a.slot)
            return Val(d)
        if name == "isFirstCycle_0":
            d = em.slot()
            em.emit("X_IS_FIRST_CYCLE", d)
            return Val(d)
        if name == "divide":
            slots = [self.as_val(v).slot for v in rest]
            d = em.slot(4)
            # pack 5 args: a=args[0], b=args[1]<<16|args[2]? no: use argtable
            em.emit("X_DIVIDE", d, slots[0], slots[1] | (slots[2] << 16),
                    slots[3] | (slots[4] << 16))
            return [Val(d + i) for i in range(4)]
        if name == "hostReadPrepare":
            a = self.as_val(rest[0]); b = self.as_val(rest[1])
            d = em.slot()
            em.emit("X_HOST_READ_PREPARE", d, a.slot, b.slot)
            return Val(d)
        if name == "hostWrite":
            slots = [self.as_val(v).slot for v in rest]
            d = em.slot()
            em.emit("X_HOST_WRITE", d, slots[0] | (slots[1] << 16),
                    slots[2] | (slots[3] << 16))
            return Val(d)
        if name == "nextPagingIdx":
            d = em.slot(2)
            em.emit("X_NEXT_PAGING_IDX", d)
            return [Val(d), Val(d + 1)]
        if name == "bigIntExtern":
            d = em.slot(16)
            em.emit("X_BIGINT_EXTERN", d)
            return [Val(d + i) for i in range(16)]
        if name == "getCycle":
            d = em.slot()
            em.emit("GET_CYCLE", d)
            return Val(d)
        if name == "isFirstCycle":
            d = em.slot()
            em.emit("X_IS_FIRST_CYCLE", d)
            return Val(d)
        if name == "getPreimage":
            a = self.as_val(rest[0])
            d = em.slot()
            em.emit("K_GET_PREIMAGE", d, a.slot)
            return Val(d)
        if name == "nextPreimage":
            d = em.slot()
            em.emit("K_NEXT_PREIMAGE", d)
            return Val(d)
        if name in ("log", "assert", "print"):
            return None
        raise NameError(f"unknown extern {name}")

    def eval_map(self, args, env):
        arr = self.eval_expr(args[0], env)
        assert isinstance(arr, list)
        if len(args) == 2:
            lam = self.eval_expr(args[1], env)
            outs = []
            for x in arr:
                outs.append(self.apply_lambda(lam, [x]))
            return outs
        lay = self.eval_expr(args[1], env)
        lam = self.eval_expr(args[2], env)
        outs = []
        for i, x in enumerate(arr):
            sub = Bound(lay.buf, lay.layout[i]) if isinstance(lay, Bound) \
                else lay[i]
            outs.append(self.apply_lambda(lam, [x, sub]))
        return outs

    def eval_reduce(self, args, env):
        arr = self.eval_expr(args[0], env)
        cur = self.eval_expr(args[1], env)
        if len(args) == 3:
            lam = self.eval_expr(args[2], env)
            for x in arr:
                cur = self.apply_lambda(lam, [cur, x])
            return cur
        lay = self.eval_expr(args[2], env)
        lam = self.eval_expr(args[3], env)
        for i, x in enumerate(arr):
            sub = Bound(lay.buf, lay.layout[i])
            cur = self.apply_lambda(lam, [cur, x, sub])
        return cur

    def apply_lambda(self, lam, args):
        tag, params, body, closure = lam
        local = dict(closure)
        for p, a in zip(params, args):
            local[p] = a
        return self.eval_body(body, local)

    # -- statements ---------------------------------------------------------
    def eval_body(self, stmts, env):
        for st in stmts:
            k = st[0]
            if k == "decl":
                env[st[2]] = (self.eval_expr(st[3], env)
                              if st[3] is not None else Unset)
            elif k == "declmulti":
                vals = self.eval_expr(st[2], env)
                assert isinstance(vals, list) and len(vals) == len(st[1])
                for n, v in zip(st[1], vals):
                    env[n] = v
            elif k == "assign":
                env[st[1]] = self.eval_expr(st[2], env)
            elif k == "expr":
                self.eval_expr(st[1], env)
            elif k == "return":
                return (self.eval_expr(st[1], env)
                        if st[1] is not None else None)
            elif k == "if":
                self.eval_if(st[1], env)
            elif k == "unreachable":
                self.em.emit("UNREACHABLE")
            else:
                raise ValueError(f"stmt: {st}")
        return None

    def eval_if(self, arms, env):
        em = self.em
        # evaluate each arm into the op stream with JZ/JMP patching
        end_jumps = []
        arm_envs = []
        prev_jz = None
        for cond, body in arms:
            if prev_jz is not None:
                em.ops[prev_jz][3] = len(em.ops)
                prev_jz = None
            if cond is not None:
                cv = self.eval_expr(cond, env)
                if isinstance(cv, int):
                    raise ValueError("constant if cond")
                cv = self.as_val(cv)
                prev_jz = em.emit("JZ", 0, cv.slot, 0)
            arm_env = dict(env)
            self.eval_body(body, arm_env)
            writes = {n for n in arm_env
                      if arm_env[n] is not env.get(n, Unset)}
            dead = any(st[0] == "unreachable" for st in body)
            arm_envs.append((arm_env, writes, dead,
                             em.emit("JMP", 0, 0, 0)))
        if prev_jz is not None:
            em.ops[prev_jz][3] = len(em.ops)
        # merge: names written in ANY arm and pre-declared in env
        merged = set()
        for _, writes, dead, _ in arm_envs:
            if not dead:
                merged |= {n for n in writes if n in env}
        merged = sorted(merged)
        # build phi shapes from the first arm that defines each name
        phis = {}
        for name in merged:
            shape_src = None
            for arm_env, writes, dead, _ in arm_envs:
                if name in writes and arm_env[name] is not Unset:
                    shape_src = arm_env[name]
                    break
            phis[name] = self.make_phi(shape_src)
        # insert MOVs at each arm end (before its JMP) — we instead append
        # a patch block per arm: rewrite by emitting movs after the fact is
        # complex; simpler: we re-emit arms.  To keep one pass, we emit MOVs
        # *after* each arm body and before JMP.  Since JMP was already
        # emitted, patch: convert that JMP into first MOV? Simplest approach:
        # we emitted JMP placeholders; now build a trailer section per arm.
        for arm_env, writes, dead, jmp_idx in arm_envs:
            em.ops[jmp_idx][3] = len(em.ops)  # jump to trailer
            if not dead:
                for name in merged:
                    v = arm_env.get(name, Unset)
                    if v is Unset:
                        raise ValueError(f"phi var {name} unset in an arm")
                    self.emit_phi_moves(phis[name], v)
            end_jumps.append(em.emit("JMP", 0, 0, 0))
        for j in end_jumps:
            em.ops[j][3] = len(em.ops)
        for name in merged:
            env[name] = phis[name]

    def make_phi(self, shape):
        if isinstance(shape, (Val, int)):
            return Val(self.em.slot())
        if isinstance(shape, Ext):
            return Ext(self.em.slot(4))
        if isinstance(shape, dict):
            return {k: self.make_phi(v) for k, v in shape.items()}
        if isinstance(shape, list):
            return [self.make_phi(v) for v in shape]
        if shape is None:
            return None
        raise TypeError(f"phi shape: {shape!r}")

    def emit_phi_moves(self, phi, v):
        if isinstance(phi, Val):
            v = self.as_val(v)
            self.em.emit("MOV", phi.slot, v.slot)
        elif isinstance(phi, Ext):
            v = self.as_ext(v)
            self.em.emit("EMOV", phi.slot, v.slot)
        elif isinstance(phi, dict):
            for k in phi:
                self.emit_phi_moves(phi[k], v[k])
        elif isinstance(phi, list):
            for a, b in zip(phi, v):
                self.emit_phi_moves(a, b)
        elif phi is None:
            pass
        else:
            raise TypeError(f"phi: {phi!r}")


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def extract_program(fns, layouts, entry, bufs):
    ev = Evaluator(fns, layouts)
    params, body = fns[entry]
    env = {}
    pi = 0
    for p in params:
        if p == "ctx":
            env[p] = None
            continue
        env[p] = bufs[pi]
        pi += 1
    ev.eval_body(body, env)
    return ev.em


def get_path(layout, path):
    cur = layout
    for part in path.split("."):
        m = re.match(r"(\w+)\[(\d+)\]$", part)
        if m:
            cur = cur[m.group(1)][int(m.group(2))]
        else:
            cur = cur[part]
    return cur


def serialize(em, path):
    # 16-bit slot packing is only used by X_DIVIDE / X_HOST_WRITE operands
    if em.n_slots >= (1 << 16):
        packed = {OPS["X_DIVIDE"], OPS["X_HOST_WRITE"]}
        assert not any(op[0] in packed for op in em.ops),             "slot ids must fit 16-bit packing for divide/hostWrite"
    with open(path, "wb") as f:
        f.write(struct.pack("<4sIIII", b"WGN1", len(em.ops), em.n_slots,
                            len(em.extconsts), 0))
        import numpy as np
        ops = np.array(em.ops, dtype=np.uint32)
        f.write(ops.tobytes())
        ec = np.array(em.extconsts, dtype=np.uint32).reshape(-1, 4) \
            if em.extconsts else np.zeros((0, 4), np.uint32)
        f.write(ec.tobytes())


def main():
    with open(os.path.join(REF, "steps.cpp")) as f:
        steps_src = f.read()
    with open(os.path.join(REF, "layout.cpp.inc")) as f:
        layout_src = f.read()

    print("parsing layouts...")
    layouts = parse_layouts(layout_src)
    print(f"  {len(layouts)} layout constants")
    print("parsing functions...")
    fns = parse_functions(steps_src)
    print(f"  {len(fns)} functions")
    assert "step_Top" in fns and "step_TopAccum" in fns

    print("extracting exec program (step_Top)...")
    em_exec = extract_program(fns, layouts, "step_Top",
                              [BUF_DATA, BUF_GLOBAL])
    print(f"  {len(em_exec.ops)} ops, {em_exec.n_slots} slots, "
          f"{len(em_exec.locs)} locs")

    print("extracting accum program (step_TopAccum)...")
    em_accum = extract_program(fns, layouts, "step_TopAccum",
                               [BUF_ACCUM, BUF_DATA, BUF_GLOBAL, BUF_MIX])
    print(f"  {len(em_accum.ops)} ops, {em_accum.n_slots} slots, "
          f"{len(em_accum.locs)} locs")

    os.makedirs(OUT_DIR, exist_ok=True)
    serialize(em_exec, os.path.join(OUT_DIR, "witgen_exec.bin"))
    serialize(em_accum, os.path.join(OUT_DIR, "witgen_accum.bin"))

    top = layouts["kLayout_Top"]
    glob = layouts["kLayoutGlobal"]
    p2 = get_path(top, "instResult.arm9.state")
    sha = get_path(top, "instResult.arm11.state")
    bigint = get_path(top, "instResult.arm12.state")
    accum_lay = layouts["kLayout_TopAccum"]

    def reg(x):
        return x["_super"] if isinstance(x, dict) else x

    meta = {
        "inject": {
            # reference prove/witgen/mod.rs:354-366 set_cycle
            "cycle": reg(top["cycle"]),
            "next_pc_low": reg(top["nextPcLow"]),
            "next_pc_high": reg(top["nextPcHigh"]),
            "next_state": reg(top["nextState_0"]),
            "next_machine_mode": reg(top["nextMachineMode"]),
            # reference mod.rs:236-241 Back::Ecall
            "ecall_s0": reg(get_path(top, "instResult.arm8.s0")),
            "ecall_s1": reg(get_path(top, "instResult.arm8.s1")),
            "ecall_s2": reg(get_path(top, "instResult.arm8.s2")),
            # reference witgen/poseidon2.rs:92-131 offsets()
            "p2_state": [reg(p2[k]) for k in [
                "hasState", "stateAddr", "bufOutAddr", "isElem", "checkOut",
                "loadTxType", "nextState", "subState", "bufInAddr", "count",
                "mode"]] + [reg(p2["inner"][i]) for i in range(24)] + [
                reg(p2["zcheck"]) + i for i in range(4)],
            # reference witgen/sha2.rs:25-43
            "sha_fp": [reg(sha[k]) for k in [
                "stateInAddr", "stateOutAddr", "dataAddr", "count", "kAddr",
                "round", "nextState"]],
            "sha_u32": [reg(get_path(sha, "a[0]")),
                        reg(get_path(sha, "e[0]")),
                        reg(get_path(sha, "w[0]"))],
            # reference witgen/bigint.rs offsets
            "bigint_state": [reg(bigint[k]) for k in [
                "isEcall", "mode", "pc", "polyOp", "coeff"]] + [
                reg(bigint["bytes"][i]) for i in range(16)] + [
                reg(bigint["nextState"])],
        },
        "user_accum_split": reg(accum_lay["columns"][0]),
        "global": {  # reference prove/witgen/mod.rs:269-335 build_global_vec
            "state_in": [[reg(g["low"]), reg(g["high"])]
                         for g in glob["stateIn"]["values"]],
            "state_out": [[reg(g["low"]), reg(g["high"])]
                          for g in glob["stateOut"]["values"]],
            "input": [[reg(g["low"]), reg(g["high"])]
                      for g in glob["input"]["values"]],
            "output": [[reg(g["low"]), reg(g["high"])]
                       for g in glob["output"]["values"]],
            "povw_nonce": [[reg(g["low"]), reg(g["high"])]
                           for g in glob["povwNonce"]["values"]],
            "rng": reg(glob["rng"]),
            "is_terminate": reg(glob["isTerminate"]),
            "shutdown_cycle": reg(glob["shutdownCycle"]),
            "term_a0_low": reg(glob["termA0low"]),
            "term_a0_high": reg(glob["termA0high"]),
            "term_a1_low": reg(glob["termA1low"]),
            "term_a1_high": reg(glob["termA1high"]),
        },
        "regcount": {"data": 211, "accum": 103, "global": 90, "mix": 36,
                     "code": 1},
        "exec_locs": em_exec.locs,
        "accum_locs": em_accum.locs,
    }
    with open(os.path.join(OUT_DIR, "witgen_meta.json"), "w") as f:
        json.dump(meta, f)
    print("wrote", OUT_DIR)




# ---------------------------------------------------------------------------
# Keccak circuit (risc0/circuit/keccak-sys/kernels/cxx/steps_*.cpp)
# ---------------------------------------------------------------------------

KECCAK_REF = "/root/reference/risc0/circuit/keccak-sys/kernels/cxx"
KECCAK_OUT = os.path.join(os.path.dirname(__file__), "..",
                          "risc0_tpu", "circuit", "keccak", "data")


def main_keccak():
    import glob as _glob
    srcs = sorted(_glob.glob(os.path.join(KECCAK_REF, "steps_*.cpp")))
    steps_src = "\n".join(open(p).read() for p in srcs)
    with open(os.path.join(KECCAK_REF, "layout.cpp.inc")) as f:
        layout_src = f.read()

    print("parsing keccak layouts...")
    layouts = parse_layouts(layout_src)
    print(f"  {len(layouts)} layout constants")
    print("parsing keccak functions...")
    fns = parse_functions(steps_src)
    print(f"  {len(fns)} functions")
    assert "step_Top" in fns

    print("extracting keccak exec program (step_Top)...")
    em = extract_program(fns, layouts, "step_Top", [BUF_DATA, BUF_GLOBAL])
    print(f"  {len(em.ops)} ops, {em.n_slots} slots, {len(em.locs)} locs")

    os.makedirs(KECCAK_OUT, exist_ok=True)
    serialize(em, os.path.join(KECCAK_OUT, "witgen_exec.bin"))

    top = layouts["kLayout_Top"]
    glob_l = layouts["kLayoutGlobal"]

    def reg(x):
        return x["_super"] if isinstance(x, dict) else x

    meta = {
        # scatter columns (reference keccak prove/preflight.rs:378-421)
        "scatter": {
            "control_state": reg(top["controlState"]["cycleType"]),
            "cycle_mux": reg(top["cycleMux"]["_super"][0]),
            "bits": reg(top["curState"]["bits"][0]),
            "kflat": reg(top["curState"]["kflat"][0]),
            "sflat": reg(top["curState"]["sflat"][0]),
        },
        "global": {
            "total_cycles": reg(glob_l["totalCycles"]),
            # 16 shorts: values[2i]=low, values[2i+1]=high (prove/mod.rs)
            "final_digest": [reg(v)
                             for v in glob_l["finalDigest"]["values"]],
        },
        "regcount": {"data": 1096, "accum": 1, "global": 17, "mix": 4,
                     "code": 1},
        "exec_locs": em.locs,
    }
    with open(os.path.join(KECCAK_OUT, "witgen_meta.json"), "w") as f:
        json.dump(meta, f)
    print("wrote", KECCAK_OUT)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "keccak":
        main_keccak()
    else:
        main()
