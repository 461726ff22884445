#!/usr/bin/env python3
"""Extract the rv32im circuit definition from the reference's generated code.

The reference's constraint polynomial lives in zirgen-GENERATED files
(risc0/circuit/rv32im-sys/kernels/cxx/rust_poly_fp_{0..3}.cpp — a single SSA
expression DAG split across 20 helper functions, and
risc0/circuit/rv32im/src/zirgen/taps.rs).  These are derived circuit *data*
(like control IDs or hash constants), not hand-written logic; this script
parses them into a flat SSA IR (numpy arrays) consumed by our own evaluators:

  * prover eval_check over the 4x domain (TPU)
  * verifier poly_ext at the DEEP point (replaces the reference's
    poly_ext.rs, which is absent from the snapshot)

Usage: python scripts/extract_rv32im.py [--src DIR] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

SRC_DEFAULT = "/root/reference/risc0/circuit/rv32im-sys/kernels/cxx"
TAPS_DEFAULT = "/root/reference/risc0/circuit/rv32im/src/zirgen/taps.rs"
OUT_DEFAULT = os.path.join(os.path.dirname(__file__), "..", "risc0_tpu",
                           "circuit", "rv32im", "data")

# ---------------------------------------------------------------------------
# taps.rs
# ---------------------------------------------------------------------------

def extract_taps(path: str) -> dict:
    src = open(path).read()
    taps = re.findall(
        r"TapData \{\s*offset: (\d+),\s*back: (\d+),\s*group: (\d+),"
        r"\s*combo: (\d+),\s*skip: (\d+),?\s*\}", src)
    taps = np.array([[int(v) for v in t] for t in taps], np.int32)

    def grab_list(name):
        m = re.search(name + r": &\[([0-9,\s]*)\]", src)
        return np.array([int(x) for x in m.group(1).split(",") if x.strip()],
                        np.int32)

    def grab_int(name):
        return int(re.search(name + r": (\d+)", src).group(1))

    return {
        "taps": taps,  # (n, 5): offset, back, group, combo, skip
        "combo_taps": grab_list("combo_taps"),
        "combo_begin": grab_list("combo_begin"),
        "group_begin": grab_list("group_begin"),
        "combos_count": grab_int("combos_count"),
        "reg_count": grab_int("reg_count"),
        "tot_combo_backs": grab_int("tot_combo_backs"),
    }


# ---------------------------------------------------------------------------
# rust_poly_fp parsing
# ---------------------------------------------------------------------------

RE_FN = re.compile(r"^FpExt (\w+)\(size_t cycle, size_t steps, FpExt\* poly_mix, (.*)\) \{")
RE_CONST = re.compile(r"^  constexpr Fp x(\d+)\((\d+)\);")
RE_SCRATCH_DECL = re.compile(r"^  (Fp|FpExt) x(\d+)\[(\d+)\];")
RE_TAP = re.compile(
    r"^  auto x(\d+) = (?:/\*\w+=\*/)?(args\[\d+\]|arg\d+|x\d+)"
    r"\[(\d+) \* steps \+ \(\(cycle - kInvRate \* (\d+)\) & mask\)\];")
RE_PLAIN_RD = re.compile(
    r"^  auto x(\d+) = (?:/\*\w+=\*/)?(args\[\d+\]|arg\d+|x\d+)\[(\d+)\];")
RE_BINOP = re.compile(r"^  auto x(\d+) = x(\d+) ([+\-*]) x(\d+);")
RE_EXT0 = re.compile(r"^  FpExt x(\d+) = FpExt\(0\);")
RE_EXT_CONST = re.compile(
    r"^  constexpr FpExt x(\d+)\((\d+),(\d+),(\d+),(\d+)\);")
RE_EXT = re.compile(r"^  FpExt x(\d+) = (\w+(?:\[\d+\])?) \+ (.*) \* poly_mix\[(\d+)\];")
RE_STORE = re.compile(
    r"^  (?:/\*\w+=\*/)?(args\[\d+\]|arg\d+|x\d+)\[(\d+)\] = x(\d+);")
RE_CALL = re.compile(
    r"^  (?:FpExt|auto) x(\d+) = (rv32im_v2_\d+)\(cycle, steps, poly_mix, (.*)\);")
RE_RETURN = re.compile(r"^  return x(\d+);")


def parse_functions(src_dir: str) -> dict:
    """Parse all function bodies keyed by name."""
    fns = {}
    for i in range(4):
        path = os.path.join(src_dir, f"rust_poly_fp_{i}.cpp")
        lines = open(path).read().splitlines()
        j = 0
        while j < len(lines):
            m = RE_FN.match(lines[j])
            if not m:
                j += 1
                continue
            name, params_src = m.group(1), m.group(2)
            params = []  # list of (type, localname)
            if name != "poly_fp":
                for p in params_src.split(", "):
                    ty, pname = p.rsplit(" ", 1)
                    params.append((ty.strip(), pname.replace("*", "").strip()))
            body = []
            j += 1
            while j < len(lines) and lines[j] != "}":
                ln = lines[j]
                if ln.strip().startswith("//") or ln.strip() in ("", "size_t mask = steps - 1;"):
                    j += 1
                    continue
                body.append(ln)
                j += 1
            fns[name] = (params, body)
        # only file containing poly_fp defines everything else too; all files
        # share identical helper declarations but bodies differ per file?
        # They don't: each file defines a subset.  Merge by name (first wins
        # means we must not clobber). Actually each function is defined once
        # across the four files; duplicates would indicate a parse error.
    return fns


class Extractor:
    def __init__(self, fns):
        self.fns = fns
        self.ops = []          # list of tuples
        self.n_f = 0           # fp register count
        self.n_e = 0           # ext register count
        self.fscr_size = 0
        self.escr_size = 0
        self.buf_names = {0: "accum", 1: "data", 2: "global", 3: "mix"}

    def new_f(self):
        self.n_f += 1
        return self.n_f - 1

    def new_e(self):
        self.n_e += 1
        return self.n_e - 1

    def run(self):
        ret = self.inline("poly_fp", {})
        assert ret[0] == "e"
        self.ret = ret[1]
        return self

    def _resolve(self, token, env):
        """Resolve a token (xN / argN / args[N]) to a descriptor."""
        token = re.sub(r"/\*\w+=\*/", "", token).strip()
        if token.startswith("args["):
            return ("buf", int(token[5:-1]))
        m = re.match(r"^x(\d+)$", token)
        if m:
            return env[f"x{m.group(1)}"]
        m = re.match(r"^arg(\d+)$", token)
        if m:
            return env[token]
        raise ValueError(f"cannot resolve token: {token}")

    def inline(self, fn_name, env):
        params, body = self.fns[fn_name]
        ret = None
        for ln in body:
            m = RE_CONST.match(ln)
            if m:
                dst = self.new_f()
                self.ops.append(("fconst", dst, int(m.group(2))))
                env[f"x{m.group(1)}"] = ("f", dst)
                continue
            m = RE_SCRATCH_DECL.match(ln)
            if m:
                ty, name, size = m.group(1), m.group(2), int(m.group(3))
                if ty == "Fp":
                    assert self.fscr_size == 0, "multiple Fp scratch arrays"
                    self.fscr_size = size
                    env[f"x{name}"] = ("fscr",)
                else:
                    assert self.escr_size == 0
                    self.escr_size = size
                    env[f"x{name}"] = ("escr",)
                continue
            m = RE_TAP.match(ln)
            if m:
                base = self._resolve(m.group(2), env)
                assert base[0] == "buf", f"tap read from non-buffer: {ln}"
                dst = self.new_f()
                self.ops.append(("ftap", dst, base[1], int(m.group(3)),
                                 int(m.group(4))))
                env[f"x{m.group(1)}"] = ("f", dst)
                continue
            m = RE_PLAIN_RD.match(ln)
            if m:
                base = self._resolve(m.group(2), env)
                idx = int(m.group(3))
                if base[0] == "escr":
                    dst = self.new_e()
                    self.ops.append(("escr_rd", dst, idx))
                    env[f"x{m.group(1)}"] = ("e", dst)
                    continue
                dst = self.new_f()
                if base[0] == "buf":
                    self.ops.append(("fglobal", dst, base[1], idx))
                elif base[0] == "fscr":
                    self.ops.append(("fscr_rd", dst, idx))
                else:
                    raise ValueError(f"plain read from {base}: {ln}")
                env[f"x{m.group(1)}"] = ("f", dst)
                continue
            m = RE_BINOP.match(ln)
            if m:
                a = env[f"x{m.group(2)}"]
                b = env[f"x{m.group(4)}"]
                sym = m.group(3)
                if a[0] == "f" and b[0] == "f":
                    dst = self.new_f()
                    opname = {"+": "fadd", "-": "fsub", "*": "fmul"}[sym]
                    self.ops.append((opname, dst, a[1], b[1]))
                    env[f"x{m.group(1)}"] = ("f", dst)
                else:
                    dst = self.new_e()
                    if a[0] == "e" and b[0] == "e":
                        opname = {"+": "eadd", "-": "esub", "*": "emul"}[sym]
                        self.ops.append((opname, dst, a[1], b[1]))
                    else:
                        # mixed fp/ext: only scaling is defined
                        e = a if a[0] == "e" else b
                        f = b if a[0] == "e" else a
                        if sym == "*":
                            self.ops.append(("escale", dst, e[1], f[1]))
                        elif sym == "+":
                            self.ops.append(("eaddf", dst, e[1], f[1]))
                        elif a[0] == "f":  # fp - ext
                            self.ops.append(("fsube", dst, a[1], b[1]))
                        else:  # ext - fp
                            self.ops.append(("esubf", dst, a[1], b[1]))
                    env[f"x{m.group(1)}"] = ("e", dst)
                continue
            m = RE_EXT0.match(ln)
            if m:
                dst = self.new_e()
                self.ops.append(("econst", dst, 0, 0, 0, 0))
                env[f"x{m.group(1)}"] = ("e", dst)
                continue
            m = RE_EXT_CONST.match(ln)
            if m:
                dst = self.new_e()
                self.ops.append(("econst", dst, int(m.group(2)),
                                 int(m.group(3)), int(m.group(4)),
                                 int(m.group(5))))
                env[f"x{m.group(1)}"] = ("e", dst)
                continue
            m = RE_EXT.match(ln)
            if m:
                acc = self._resolve(m.group(2), env)
                assert acc[0] == "e", f"ext madd acc not ext: {ln}"
                factors = [self._resolve(t, env) for t in m.group(3).split(" * ")]
                f_factors = [f[1] for f in factors if f[0] == "f"]
                e_factors = [f[1] for f in factors if f[0] == "e"]
                assert len(f_factors) + len(e_factors) == len(factors)
                assert len(e_factors) <= 1, f"multiple ext factors: {ln}"
                dst = self.new_e()
                # emadd: dst = acc + prod(f_factors) * [e_factor] * pm[k]
                self.ops.append(("emadd", dst, acc[1], int(m.group(4)),
                                 tuple(f_factors),
                                 e_factors[0] if e_factors else -1))
                env[f"x{m.group(1)}"] = ("e", dst)
                continue
            m = RE_STORE.match(ln)
            if m:
                base = self._resolve(m.group(1), env)
                idx = int(m.group(2))
                val = env[f"x{m.group(3)}"]
                if base[0] == "fscr":
                    assert val[0] == "f"
                    self.ops.append(("fscr_wr", idx, val[1]))
                elif base[0] == "escr":
                    assert val[0] == "e"
                    self.ops.append(("escr_wr", idx, val[1]))
                else:
                    raise ValueError(f"store to {base}: {ln}")
                continue
            m = RE_CALL.match(ln)
            if m:
                callee = m.group(2)
                arg_tokens = m.group(3).split(", ")
                cparams, _ = self.fns[callee]
                assert len(cparams) == len(arg_tokens), \
                    f"arity mismatch {callee}: {len(cparams)} vs {len(arg_tokens)}"
                cenv = {}
                for (ty, pname), tok in zip(cparams, arg_tokens):
                    desc = self._resolve(tok, env)
                    # type check
                    if ty == "FpExt":
                        assert desc[0] == "e", f"{callee} {pname}: {desc}"
                    elif ty == "Fp":
                        assert desc[0] == "f"
                    elif ty == "Fp*":
                        assert desc[0] in ("buf", "fscr")
                    elif ty == "FpExt*":
                        assert desc[0] == "escr"
                    cenv[pname] = desc
                ret_desc = self.inline(callee, cenv)
                env[f"x{m.group(1)}"] = ret_desc
                continue
            m = RE_RETURN.match(ln)
            if m:
                ret = env[f"x{m.group(1)}"]
                continue
            raise ValueError(f"unparsed line in {fn_name}: {ln!r}")
        assert ret is not None, f"no return in {fn_name}"
        return ret

    def pack(self) -> dict:
        """Pack ops into numpy arrays: generic op table.

        Encoding: opcode i8, a/b/c/d int32 (meaning per op).  emadd factor
        lists (0-2 fp factors) are flattened into a/b with -1 padding.
        """
        OPC = {"fconst": 0, "ftap": 1, "fglobal": 2, "fscr_rd": 3,
               "fadd": 4, "fsub": 5, "fmul": 6, "econst": 7, "emadd": 8,
               "fscr_wr": 9, "escr_wr": 10, "escr_rd": 11, "eadd": 12,
               "esub": 13, "emul": 14, "escale": 15, "eaddf": 16,
               "fsube": 17, "esubf": 18}
        n = len(self.ops)
        opcode = np.zeros(n, np.int8)
        A = np.full((n, 6), -1, np.int64)
        for i, op in enumerate(self.ops):
            opcode[i] = OPC[op[0]]
            if op[0] == "emadd":
                dst, acc, k, ffs, ef = op[1], op[2], op[3], op[4], op[5]
                row = [dst, acc, k, ffs[0] if len(ffs) > 0 else -1,
                       ffs[1] if len(ffs) > 1 else -1, ef]
                assert len(ffs) <= 2
                A[i, : len(row)] = row
            else:
                vals = op[1:]
                A[i, : len(vals)] = vals
        return {
            "opcode": opcode, "operands": A,
            "n_f": self.n_f, "n_e": self.n_e,
            "fscr_size": self.fscr_size, "escr_size": self.escr_size,
            "ret": self.ret,
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC_DEFAULT)
    ap.add_argument("--taps", default=TAPS_DEFAULT)
    ap.add_argument("--out", default=OUT_DEFAULT)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    taps = extract_taps(args.taps)
    np.savez_compressed(os.path.join(args.out, "taps.npz"), **taps)
    print(f"taps: {len(taps['taps'])} taps, {taps['reg_count']} regs, "
          f"{taps['combos_count']} combos")

    fns = parse_functions(args.src)
    print(f"parsed {len(fns)} functions: "
          f"{sorted(fns.keys(), key=lambda s: (len(s), s))[:5]}...")
    ex = Extractor(fns).run()
    packed = ex.pack()
    np.savez_compressed(os.path.join(args.out, "poly_fp_ir.npz"), **packed)
    counts = {}
    for op in ex.ops:
        counts[op[0]] = counts.get(op[0], 0) + 1
    print(f"IR: {len(ex.ops)} ops, {ex.n_f} fp regs, {ex.n_e} ext regs, "
          f"scratch f={ex.fscr_size} e={ex.escr_size}")
    print("op counts:", json.dumps(counts, indent=None))


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# layout.rs.inc: resolve LAYOUT_GLOBAL into a JSON tree of register offsets
# ---------------------------------------------------------------------------

def extract_global_layout(path: str) -> dict:
    src = open(path).read()
    # parse every `pub const NAME: ... = <expr>;` where expr is a nested
    # struct/array literal with `Reg { offset: N }` leaves
    defs = {}
    for m in re.finditer(r"pub const (\w+): [^=]+= (.*?);\n(?=pub const|\Z)",
                         src, re.S):
        defs[m.group(1)] = m.group(2)

    def parse(expr: str):
        expr = expr.strip().lstrip("&").strip()
        m = re.fullmatch(r"Reg \{ offset: (\d+),? \}", expr, re.S)
        if m:
            return int(m.group(1))
        if expr.startswith("["):
            return [parse(e) for e in _split_top(expr[1:-1])]
        m = re.match(r"\w+ \{(.*)\}$", expr, re.S)
        if m:
            out = {}
            for fld in _split_top(m.group(1)):
                if not fld.strip():
                    continue
                k, v = fld.split(":", 1)
                v = v.strip()
                if re.fullmatch(r"LAYOUT__\d+", v):
                    out[k.strip()] = parse(defs[v])
                else:
                    out[k.strip()] = parse(v)
            return out
        if re.fullmatch(r"LAYOUT__\d+", expr):
            return parse(defs[expr])
        raise ValueError(f"cannot parse layout expr: {expr[:80]}")

    def _split_top(s: str):
        parts, depth, cur = [], 0, []
        for ch in s:
            if ch in "{[":
                depth += 1
            elif ch in "}]":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if "".join(cur).strip():
            parts.append("".join(cur))
        return parts

    return parse(defs["LAYOUT_GLOBAL"])
