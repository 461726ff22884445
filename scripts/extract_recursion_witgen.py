#!/usr/bin/env python3
"""Extract the recursion circuit's generated witgen into bytecode.

The recursion circuit ships an older zirgen C++ dialect
(risc0/circuit/recursion-sys/kernels/cxx/step_{exec,verify_mem,
compute_accum,verify_accum}.cpp): direct args[buf][col*steps+cycle]
accesses, write-once store blocks with consistency asserts, `if (x != 0)`
guards, ternary iszero, and externs for the WOM/plonk arguments.  We
partially evaluate each step function into the same flat bytecode the
witgen interpreter (csrc/witgen.cpp) executes, with recursion-specific
extern opcodes.

Buffer ids: data=0, global=1, accum=2, mix=3, ctrl=4 (exec args are
[ctrl, global, data]; accum args are [ctrl, global, data, mix, accum] —
reference kernels/cxx/context.h args()).
"""

import importlib.util
import json
import os
import re
import struct
import sys

import numpy as np

_HERE = os.path.dirname(__file__)
SRC = "/root/reference/risc0/circuit/recursion-sys/kernels/cxx"
OUT = os.path.join(_HERE, "..", "risc0_tpu", "circuit", "recursion", "data")

spec = importlib.util.spec_from_file_location(
    "extract_witgen", os.path.join(_HERE, "extract_witgen.py"))
W = importlib.util.module_from_spec(spec)
sys.modules["extract_witgen"] = W
spec.loader.exec_module(W)

OPS = W.OPS
# recursion extern opcodes appended after the existing table
_REC_OPS = ["R_WOM_READ", "R_IOP_BODY", "R_PLONK_READ_WOM",
            "R_PLONK_WRITE_WOM", "R_PLONK_READ_ACCUM", "R_PLONK_WRITE_ACCUM",
            "LOADZ"]
for name in _REC_OPS:
    if name not in OPS:
        OPS[name] = len(OPS)

P = 2013265921


class RecEvaluator:
    """Partial evaluator for the recursion step dialect."""

    def __init__(self, arg_bufs):
        self.em = W.Emitter()
        self.arg_bufs = arg_bufs  # maps argsN -> interpreter buffer id

    # -- expressions --------------------------------------------------------
    def as_val(self, v):
        if isinstance(v, W.Val):
            return v
        if isinstance(v, int):
            return self.em.const(v)
        raise TypeError(f"not scalar: {v!r}")

    def eval(self, e, env):
        k = e[0]
        if k == "num":
            return e[1]
        if k == "str":
            return e[1]
        if k == "var":
            return env[e[1]]
        if k == "neg":
            v = self.eval(e[1], env)
            if isinstance(v, int):
                return (-v) % P
            d = self.em.slot()
            self.em.emit("NEG", d, self.as_val(v).slot)
            return W.Val(d)
        if k == "bin":
            op, a, b = e[1], self.eval(e[2], env), self.eval(e[3], env)
            if op in ("+", "-", "*"):
                if isinstance(a, int) and isinstance(b, int):
                    return {"+": (a + b), "-": (a - b), "*": (a * b)}[op] % P
                a, b = self.as_val(a), self.as_val(b)
                d = self.em.slot()
                self.em.emit({"+": "ADD", "-": "SUB", "*": "MUL"}[op],
                             d, a.slot, b.slot)
                return W.Val(d)
            if op == "&":
                a, b = self.as_val(a), self.as_val(b)
                d = self.em.slot()
                self.em.emit("BITAND", d, a.slot, b.slot)
                return W.Val(d)
            if op in ("==", "!="):
                # only used in conditions / iszero ternaries
                return ("cmp", op, a, b)
            raise ValueError(f"binop {op}")
        if k == "ternary":
            cond, at, af = e[1], e[2], e[3]
            c = self.eval(cond, env)
            tv = self.eval(at, env)
            fv = self.eval(af, env)
            assert isinstance(c, tuple) and c[0] == "cmp"
            _, op, a, b = c
            assert b == 0 and tv == 1 and fv == 0 and op == "==", e
            d = self.em.slot()
            self.em.emit("ISZ", d, self.as_val(a).slot)
            return W.Val(d)
        if k == "index":
            # args[N][col-expr] read
            base = e[1]
            if base[0] == "index" and base[1] == ("var", "args"):
                buf = self.arg_bufs[self.eval(base[2], env)]
                col, back = self.parse_colexpr(e[2], env)
                d = self.em.slot()
                self.em.emit("LOAD", d, col, back, buf)
                return W.Val(d)
            b = self.eval(e[1], env)
            i = self.eval(e[2], env)
            assert isinstance(b, list) and isinstance(i, int)
            return b[i]
        if k == "call":
            return self.eval_call(e[1], e[2], env)
        if k == "slit" and e[1] == "":
            return [self.eval(x, env) for _, x in e[2]]
        raise ValueError(f"eval: {e}")

    def parse_colexpr(self, e, env):
        """col * steps + ((cycle - back) & mask) | col * steps + cycle |
        plain col."""
        if e[0] == "num":
            return e[1], 0
        if e[0] == "bin" and e[1] == "+":
            lhs, rhs = e[2], e[3]
            assert lhs[0] == "bin" and lhs[1] == "*" and \
                lhs[3] == ("var", "steps"), e
            col = lhs[2][1]
            if rhs == ("var", "cycle"):
                return col, 0
            # ((cycle - B) & mask)
            if rhs[0] == "bin" and rhs[1] == "&":
                inner = rhs[2]
                assert inner[0] == "bin" and inner[1] == "-" and \
                    inner[2] == ("var", "cycle")
                return col, inner[3][1]
        raise ValueError(f"colexpr: {e}")

    def eval_call(self, fn, args, env):
        if fn[0] == "member" and fn[2] == "asUInt32":
            # Fp(a.asUInt32() & b.asUInt32()) -> BITAND handled via 'bin &'
            return self.eval(fn[1], env)
        assert fn[0] == "var", fn
        name = fn[1]
        if name == "Fp":
            v = self.eval(args[0], env)
            return v
        if name == "inv":
            v = self.as_val(self.eval(args[0], env))
            d = self.em.slot()
            self.em.emit("INV", d, v.slot)
            return W.Val(d)
        if name.startswith("extern_"):
            ext = name[7:]
            # args: (ctx, cycle, "extra", {list})
            vals = self.eval(args[3], env) if len(args) > 3 else []
            slots = [self.as_val(v).slot for v in vals]
            em = self.em
            if ext == "womRead":
                d = em.slot(4)
                em.emit("R_WOM_READ", d, slots[0])
                return [W.Val(d + i) for i in range(4)]
            if ext == "womWrite":
                return None  # no-op (reference extern.cpp:71)
            if ext == "readIOPHeader":
                return None
            if ext == "readIOPBody":
                d = em.slot(4)
                em.emit("R_IOP_BODY", d)
                return [W.Val(d + i) for i in range(4)]
            if ext == "plonkRead_wom":
                d = em.slot(5)
                em.emit("R_PLONK_READ_WOM", d)
                return [W.Val(d + i) for i in range(5)]
            if ext == "plonkWrite_wom":
                assert len(slots) == 5
                em.emit("R_PLONK_WRITE_WOM", 0, slots[0],
                        slots[1] | (slots[2] << 16),
                        slots[3] | (slots[4] << 16))
                return None
            if ext == "plonkReadAccum_wom":
                d = em.slot(4)
                em.emit("R_PLONK_READ_ACCUM", d)
                return [W.Val(d + i) for i in range(4)]
            if ext == "plonkWriteAccum_wom":
                assert len(slots) == 4
                em.emit("R_PLONK_WRITE_ACCUM", 0, slots[0] | (slots[1] << 16),
                        slots[2] | (slots[3] << 16))
                return None
            if ext == "readCoefficients":
                # unimplemented in the reference CPU witgen too
                # (extern.cpp:125); fails if ever reached
                em.emit("UNREACHABLE")
                d = em.slot(16)
                return [W.Val(d + i) for i in range(16)]
            if ext == "log":
                return None
            raise NameError(f"extern {ext}")
        raise NameError(f"call {name}")

    # -- statements ---------------------------------------------------------
    def run_body(self, stmts, env):
        for st in stmts:
            k = st[0]
            if k == "decl":
                if st[3] is not None:
                    env[st[2]] = self.eval(st[3], env)
                else:
                    env[st[2]] = None
            elif k == "declmulti":
                vals = self.eval(st[2], env)
                assert len(vals) == len(st[1])
                for n, v in zip(st[1], vals):
                    env[n] = v
            elif k == "const_decl":
                env[st[1]] = st[2] % P
            elif k == "expr":
                self.eval(st[1], env)
            elif k == "store_block":
                # { auto& reg = args[B][col]; assert(...); reg = xN; }
                base, colexpr, src = st[1], st[2], st[3]
                buf = self.arg_bufs[self.eval(base, env)]
                col, back = self.parse_colexpr(colexpr, env)
                assert back == 0
                v = self.as_val(self.eval(src, env))
                self.em.emit("STORE", 0, col, v.slot, buf)
            elif k == "if":
                assert len(st[1]) == 1, "no else in this dialect"
                cond, body = st[1][0]
                # `if (x != 0) throw ...;` -> EQZ runtime check
                if len(body) == 1 and body[0][0] == "throw":
                    c = self.eval(cond, env)
                    if isinstance(c, tuple) and c[0] == "cmp":
                        _, op, a, b = c
                        assert b == 0 and op == "!="
                        c = a
                    lid = self.em.loc(body[0][1])
                    self.em.emit("EQZ", 0, self.as_val(c).slot, lid)
                    continue
                # `if (xN == Fp::invalid()) xN = 0;` -> make the load
                # default to zero (LOADZ)
                if (cond[0] == "bin" and cond[1] == "==" and
                        cond[3] == ("call", ("var", "Fp::invalid"), []) and
                        len(body) == 1 and body[0][0] == "assign" and
                        body[0][1] == cond[2][1] and
                        body[0][2] == ("num", 0)):
                    v = env[cond[2][1]]
                    assert isinstance(v, W.Val)
                    for op in reversed(self.em.ops):
                        if op[1] == v.slot and op[0] == OPS["LOAD"]:
                            op[0] = OPS["LOADZ"]
                            break
                    else:
                        raise ValueError("LOADZ target not found")
                    continue
                c = self.eval(cond, env)
                if isinstance(c, tuple) and c[0] == "cmp":
                    _, op, a, b = c
                    assert b == 0 and op == "!="
                    c = a
                c = self.as_val(c)
                jz = self.em.emit("JZ", 0, c.slot, 0)
                self.run_body(body, dict(env))
                self.em.ops[jz][3] = len(self.em.ops)
            elif k == "assign":
                env[st[1]] = self.eval(st[2], env)
            elif k == "direct_store":
                tgt, src = st[1], st[2]
                assert tgt[0] == "index" and tgt[1][0] == "index" and \
                    tgt[1][1] == ("var", "args"), tgt
                buf = self.arg_bufs[self.eval(tgt[1][2], env)]
                col, back = self.parse_colexpr(tgt[2], env)
                assert back == 0
                v = self.as_val(self.eval(src, env))
                self.em.emit("STORE", 0, col, v.slot, buf)
            elif k == "skip":
                pass
            elif k == "return":
                pass
            else:
                raise ValueError(f"stmt {st}")


# ---------------------------------------------------------------------------
# Parser for this dialect (line/token based, reusing the witgen lexer)
# ---------------------------------------------------------------------------

def parse_step_file(path, fn_name):
    src = open(path).read()
    # strip the function wrapper; keep the body
    m = re.search(rf"Fp {fn_name}\(void\* ctx, size_t steps, size_t cycle,"
                  rf" Fp\*\* args\) \{{(.*)^\}}", src, re.S | re.M)
    assert m, f"{fn_name} not found in {path}"
    body_src = m.group(1)
    toks = W.tokenize(body_src)
    ts = W.TokStream(toks)
    return parse_stmts(ts)


def parse_stmts(ts):
    out = []
    while ts.peek()[1] not in ("}", ""):
        out.append(parse_stmt(ts))
    return out


def parse_expr(ts):
    e = W.parse_addsub(ts)
    while ts.peek()[1] == "&":
        ts.next()
        e = ("bin", "&", e, W.parse_addsub(ts))
    if ts.peek()[1] in ("==", "!="):
        op = ts.next()[1]
        rhs = W.parse_addsub(ts)
        e = ("bin", op, e, rhs)
    if ts.peek()[1] == "?":
        ts.next()
        a = parse_expr(ts)
        ts.expect(":")
        b = parse_expr(ts)
        e = ("ternary", e, a, b)
    return e


# the witgen primary parser recurses through W.parse_expr for parens;
# route it to this dialect's grammar
W.parse_expr = parse_expr

_orig_primary = W.parse_primary


def _rec_primary(ts):
    if ts.peek()[1] == "{":
        # bare brace list (extern argument pack)
        ts.next()
        items = []
        while ts.peek()[1] != "}":
            items.append((None, parse_expr(ts)))
            ts.accept(",")
        ts.expect("}")
        return ("slit", "", items)
    return _orig_primary(ts)


W.parse_primary = _rec_primary


def parse_stmt(ts):
    kind, text = ts.peek()
    if text == "size_t":
        while ts.next()[1] != ";":
            pass
        return ("skip",)
    if text == "{":
        # store block or plain scope
        ts.next()
        if ts.peek()[1] == "auto" and ts.peek(1)[1] == "&":
            ts.next(); ts.next()
            assert ts.next()[1] == "reg"
            ts.expect("=")
            tgt = W.parse_postfix(ts)
            ts.expect(";")
            # assert line
            assert ts.next()[1] == "assert"
            depth = 0
            while True:
                t = ts.next()[1]
                if t == "(":
                    depth += 1
                elif t == ")":
                    depth -= 1
                    if depth == 0:
                        break
            ts.expect(";")
            assert ts.next()[1] == "reg"
            ts.expect("=")
            src = parse_expr(ts)
            ts.expect(";")
            ts.expect("}")
            assert tgt[0] == "index" and tgt[1][0] == "index" and \
                tgt[1][1] == ("var", "args")
            return ("store_block", tgt[1][2], tgt[2], src)
        body = parse_stmts(ts)
        ts.expect("}")
        return ("if", [(("num", 1), body)]) if False else ("scope", body)
    if text == "if":
        ts.next()
        ts.expect("(")
        cond = parse_expr(ts)
        ts.expect(")")
        if ts.peek()[1] == "{":
            ts.next()
            body = parse_stmts(ts)
            ts.expect("}")
        else:
            body = [parse_stmt(ts)]
        return ("if", [(cond, body)])
    if text == "assert":
        depth = 0
        ts.next()
        while True:
            t = ts.next()[1]
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
                if depth == 0:
                    break
        ts.expect(";")
        return ("skip",)
    if text == "constexpr":
        ts.next()
        ts.next()  # Fp
        name = ts.next()[1]
        ts.expect("(")
        val = int(ts.next()[1], 0)
        ts.expect(")")
        ts.expect(";")
        return ("const_decl", name, val)
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
    if text == "auto":
        ts.next()
        name = ts.next()[1]
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
    if text == "throw":
        ts.next()
        msg = ""
        while ts.peek()[1] != ";":
            t = ts.next()
            if t[0] == "str":
                msg = t[1]
        ts.expect(";")
        return ("throw", msg)
    if text == "return":
        ts.next()
        while ts.next()[1] != ";":
            pass
        return ("return",)
    e = parse_expr(ts)
    if ts.peek()[1] == "=":
        # direct store: args[B][col] = xN;
        ts.next()
        v = parse_expr(ts)
        ts.expect(";")
        return ("direct_store", e, v)
    ts.expect(";")
    return ("expr", e)


def flatten_scopes(stmts):
    out = []
    for st in stmts:
        if st[0] == "scope":
            out.extend(flatten_scopes(st[1]))
        elif st[0] == "if":
            out.append(("if", [(st[1][0][0], flatten_scopes(st[1][0][1]))]))
        else:
            out.append(st)
    return out


def extract_step(path, fn_name, arg_bufs):
    stmts = flatten_scopes(parse_step_file(path, fn_name))
    ev = RecEvaluator(arg_bufs)
    env = {"args": list(range(len(arg_bufs)))}
    # args[N] evaluates via index: base ('var','args') -> list of positions
    env["args"] = list(range(len(arg_bufs)))
    ev.run_body(stmts, env)
    return ev.em


def serialize(em, path):
    with open(path, "wb") as f:
        f.write(struct.pack("<4sIIII", b"WGN1", len(em.ops), em.n_slots,
                            len(em.extconsts), 0))
        ops = np.array(em.ops, dtype=np.uint32)
        f.write(ops.tobytes())
        ec = np.array(em.extconsts, dtype=np.uint32).reshape(-1, 4) \
            if em.extconsts else np.zeros((0, 4), np.uint32)
        f.write(ec.tobytes())


def main():
    os.makedirs(OUT, exist_ok=True)
    # buffer ids: data=0, global=1, accum=2, mix=3, ctrl=4
    exec_bufs = [4, 1, 0]            # [ctrl, global, data]
    accum_bufs = [4, 1, 0, 3, 2]     # [ctrl, global, data, mix, accum]
    jobs = [
        ("step_exec.cpp", "step_exec", exec_bufs, "rec_step_exec.bin"),
        ("step_verify_mem.cpp", "step_verify_mem", exec_bufs,
         "rec_step_verify_mem.bin"),
        ("step_compute_accum.cpp", "step_compute_accum", accum_bufs,
         "rec_step_compute_accum.bin"),
        ("step_verify_accum.cpp", "step_verify_accum", accum_bufs,
         "rec_step_verify_accum.bin"),
    ]
    meta = {"ops": {k: v for k, v in OPS.items()}}
    for fname, fn, bufs, outname in jobs:
        em = extract_step(os.path.join(SRC, fname), fn, bufs)
        serialize(em, os.path.join(OUT, outname))
        print(f"{fn}: {len(em.ops)} ops, {em.n_slots} slots")
        meta[fn] = {"n_ops": len(em.ops), "n_slots": em.n_slots,
                    "locs": em.locs}
    with open(os.path.join(OUT, "rec_witgen_meta.json"), "w") as f:
        json.dump(meta, f)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
