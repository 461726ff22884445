#!/usr/bin/env python3
"""Extract POLY_MIX_POWERS (the exponent table behind poly_mix[k] indices in
the generated constraint code — reference <circuit>/src/.../info.rs) and add
it to the circuit npz data.  The generated SSA's poly_mix[k] means
mix^POLY_MIX_POWERS[k], NOT mix^k: the table is non-identity in its tail for
all three circuits."""

import re

import numpy as np

JOBS = [
    ("/root/reference/risc0/circuit/rv32im/src/zirgen/info.rs",
     "risc0_tpu/circuit/rv32im/data/poly_fp_ir.npz"),
    ("/root/reference/risc0/circuit/keccak/src/zirgen/info.rs",
     "risc0_tpu/circuit/keccak/data/poly_fp_ir.npz"),
]


def main():
    for info_path, npz_path in JOBS:
        src = open(info_path).read()
        m = re.search(r"POLY_MIX_POWERS: &\[usize\] = &\[(.*?)\];", src, re.S)
        powers = np.array([int(x) for x in re.findall(r"\d+", m.group(1))],
                          np.uint32)
        data = dict(np.load(npz_path, allow_pickle=True))
        data["mix_powers"] = powers
        np.savez_compressed(npz_path, **data)
        ident = int((powers != np.arange(len(powers))).sum())
        print(f"{npz_path}: {len(powers)} powers, {ident} non-identity")


if __name__ == "__main__":
    main()
