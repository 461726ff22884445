#!/usr/bin/env python3
"""Extract the recursion circuit's constraint polynomial into npz IR.

The recursion poly (recursion-sys/kernels/cxx/poly_fp.cpp) is the same SSA
dialect as the rv32im rust_poly_fp files; reuse that extractor.  The arg
order differs (ffi.cpp:224-230: ctrl, global, data, mix, accum), so indices
are remapped to the shared convention args[0]=accum, args[1]=data,
args[2]=global, args[3]=mix, args[4]=code/ctrl.  Also extracts the
POLY_MIX_POWERS exponent table (src/info.rs).
"""

import importlib.util
import os
import re
import sys

import numpy as np

_HERE = os.path.dirname(__file__)
SRC = "/root/reference/risc0/circuit/recursion-sys/kernels/cxx/poly_fp.cpp"
INFO = "/root/reference/risc0/circuit/recursion/src/info.rs"
OUT = os.path.join(_HERE, "..", "risc0_tpu", "circuit", "recursion", "data")

spec = importlib.util.spec_from_file_location(
    "extract_rv32im", os.path.join(_HERE, "extract_rv32im.py"))
R = importlib.util.module_from_spec(spec)
sys.modules["extract_rv32im"] = R
spec.loader.exec_module(R)

# recursion arg index -> shared buffer id
ARG_REMAP = {0: 4, 1: 2, 2: 1, 3: 3, 4: 0}


def main():
    src = open(SRC).read()
    # two-phase remap to avoid collisions
    for a in ARG_REMAP:
        src = src.replace(f"args[{a}]", f"args[@{a}]")
    for a, b in ARG_REMAP.items():
        src = src.replace(f"args[@{a}]", f"args[{b}]")

    lines = src.splitlines()
    fns = {}
    j = 0
    while j < len(lines):
        m = R.RE_FN.match(lines[j])
        if not m:
            j += 1
            continue
        name = m.group(1)
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
        fns[name] = ([], body)
    assert "poly_fp" in fns, list(fns)
    ex = R.Extractor(fns).run()
    packed = ex.pack()

    info = open(INFO).read()
    m = re.search(r"POLY_MIX_POWERS: &\[usize\] = &\[(.*?)\];", info, re.S)
    packed["mix_powers"] = np.array(
        [int(x) for x in re.findall(r"\d+", m.group(1))], np.uint32)

    np.savez_compressed(os.path.join(OUT, "poly_fp_ir.npz"), **packed)
    print(f"IR: {len(ex.ops)} ops, {ex.n_f} fp regs, {ex.n_e} ext regs, "
          f"mix powers {len(packed['mix_powers'])}")


if __name__ == "__main__":
    main()
