#!/usr/bin/env python3
"""Extract the keccak constraint polynomial + taps into npz IR.

The keccak circuit ships its generated constraint code as CUDA SSA
(risc0/circuit/keccak-sys/kernels/cuda/eval_check_*.cu) in the same shape
as the rv32im rust_poly_fp files; we normalize the dialect differences
(multi-line signatures, idx/size naming, implicit poly_mix constant,
named buffers) and reuse the rv32im SSA extractor (scripts/extract_rv32im.py
Extractor) unchanged.  Buffer ids follow the rv32im convention:
args[0]=accum, args[1]=data, args[2]=global(out), args[3]=mix, args[4]=code.
"""

import importlib.util
import json
import os
import re
import sys

import numpy as np

_HERE = os.path.dirname(__file__)
CUDA_DIR = "/root/reference/risc0/circuit/keccak-sys/kernels/cuda"
TAPS = "/root/reference/risc0/circuit/keccak/src/zirgen/taps.rs"
OUT = os.path.join(_HERE, "..", "risc0_tpu", "circuit", "keccak", "data")

spec = importlib.util.spec_from_file_location(
    "extract_rv32im", os.path.join(_HERE, "extract_rv32im.py"))
R = importlib.util.module_from_spec(spec)
sys.modules["extract_rv32im"] = R
spec.loader.exec_module(R)
# accept keccak_N callees in the call RE
R.RE_CALL = re.compile(
    r"^  (?:FpExt|auto) x(\d+) = ((?:rv32im_v2|keccak)_\d+)"
    r"\(cycle, steps, poly_mix, (.*)\);")


def join_signatures(src: str) -> str:
    """Collapse multi-line function signatures/param lists onto one line."""
    lines = src.splitlines()
    out = []
    i = 0
    while i < len(lines):
        ln = lines[i]
        if ("FpExt" in ln or "__device__" in ln) and "(" in ln \
                and ln.count("(") > ln.count(")"):
            while ln.count("(") > ln.count(")"):
                i += 1
                ln = ln.rstrip() + " " + lines[i].strip()
        elif ln.strip() in ("__device__ FpExt", "FpExt"):
            i += 1
            ln = ln.strip() + " " + lines[i].strip()
            while ln.count("(") > ln.count(")"):
                i += 1
                ln = ln.rstrip() + " " + lines[i].strip()
        out.append(ln)
        i += 1
    return "\n".join(out)


def normalize(src: str) -> str:
    src = join_signatures(src)
    src = re.sub(r"\(\s+", "(", src)   # spaces introduced by line joining
    src = src.replace("__device__ ", "")
    src = src.replace("const Fp*", "Fp*")
    # signature: (uint32_t idx, uint32_t size, ... -> rv32im dialect
    src = src.replace("(uint32_t idx, uint32_t size, ",
                      "(size_t cycle, size_t steps, FpExt* poly_mix, ")
    # calls: keccak_M(idx, size, ... -> keccak_M(cycle, steps, poly_mix, ...
    src = re.sub(r"(keccak_\d+\()idx, size, ",
                 r"\1cycle, steps, poly_mix, ", src)
    # named poly_fp buffers -> args[N]
    for name, idx in (("accum", 0), ("data", 1), ("out", 2), ("mix", 3),
                      ("ctrl", 4)):
        src = re.sub(rf"\b{name}\b", f"args[{idx}]", src)
    # remaining idx/size tokens (tap reads, mask decl)
    src = re.sub(r"\bidx\b", "cycle", src)
    src = re.sub(r"\bsize\b", "steps", src)
    src = src.replace("INV_RATE", "kInvRate")
    src = src.replace("uint32_t mask = steps - 1;", "size_t mask = steps - 1;")
    # Fp/FpExt consts -> constexpr forms the rv32im REs expect
    src = re.sub(r"^(  )Fp (x\d+\(\d+\);)$", r"\1constexpr Fp \2", src,
                 flags=re.M)
    src = re.sub(r"^(  )FpExt (x\d+\(\d+,\s*\d+,\s*\d+,\s*\d+\);)$",
                 r"\1constexpr FpExt \2", src, flags=re.M)
    # typed SSA defs -> auto (tap reads, plain reads, binops)
    src = re.sub(r"^(  )Fp (x\d+ = )", r"\1auto \2", src, flags=re.M)
    # FpExt binops (not the poly_mix accumulate form) -> auto
    src = re.sub(r"^(  )FpExt (x\d+ = x\d+ [+\-*] x\d+;)$", r"\1auto \2",
                 src, flags=re.M)
    # reorder poly_mix accumulate: x + poly_mix[k] * REST -> x + REST * pm[k]
    src = re.sub(r"\+ poly_mix\[(\d+)\] \* (.*?);", r"+ \2 * poly_mix[\1];",
                 src)
    return src


def parse_functions(srcs):
    fns = {}
    for src in srcs:
        lines = normalize(src).splitlines()
        j = 0
        while j < len(lines):
            m = R.RE_FN.match(lines[j])
            if not m:
                j += 1
                continue
            name, params_src = m.group(1), m.group(2)
            params = []
            if name != "poly_fp":
                for p in params_src.split(", "):
                    ty, pname = p.rsplit(" ", 1)
                    params.append((ty.strip(), pname.replace("*", "").strip()))
            body = []
            j += 1
            while j < len(lines) and lines[j] != "}":
                ln = lines[j]
                if ln.strip().startswith("//") or ln.strip() in (
                        "", "size_t mask = steps - 1;"):
                    j += 1
                    continue
                body.append(ln)
                j += 1
            fns[name] = (params, body)
    return fns


def main():
    os.makedirs(OUT, exist_ok=True)

    taps = R.extract_taps(TAPS)
    np.savez_compressed(os.path.join(OUT, "taps.npz"), **taps)
    print(f"taps: {len(taps['taps'])} taps, {taps['reg_count']} regs, "
          f"{taps['combos_count']} combos")

    srcs = []
    import glob
    for p in sorted(glob.glob(os.path.join(CUDA_DIR, "eval_check_*.cu"))):
        srcs.append(open(p).read())
    fns = parse_functions(srcs)
    print(f"parsed {len(fns)} functions")
    assert "poly_fp" in fns
    ex = R.Extractor(fns).run()
    packed = ex.pack()
    np.savez_compressed(os.path.join(OUT, "poly_fp_ir.npz"), **packed)
    print(f"IR: {len(ex.ops)} ops, {ex.n_f} fp regs, {ex.n_e} ext regs, "
          f"scratch f={ex.fscr_size} e={ex.escr_size}")


if __name__ == "__main__":
    main()
