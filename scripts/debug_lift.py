"""Debug harness for lift predicate EQ failures at a given po2: run the
recursion-VM PREFLIGHT only (no STARK) over a saved rv32im seal, with
eq_strict off, and map every failing EQ row back to its emission site in
the predicate generator (captured python stack at Asm.eq time).

    PYTHONPATH=/root/repo python scripts/debug_lift.py /path/seal.npy
"""

from __future__ import annotations

import sys
import traceback

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    seal = np.load(sys.argv[1])
    po2 = int(seal[91])
    print(f"seal po2={po2}, {len(seal)} words")

    from risc0_tpu.circuit.recursion import predicates as pr
    from risc0_tpu.circuit.recursion.asm import Asm
    from risc0_tpu.circuit.recursion.preflight import RecursionPreflight

    # instrument Asm.eq to record emission sites by row index
    sites = {}
    orig_eq = Asm.eq

    def eq_spy(self, a, b):
        row = len(self.rows)
        stack = traceback.extract_stack(limit=8)
        sites[row] = [f"{f.filename.split('/')[-1]}:{f.lineno} {f.name}"
                      for f in stack[:-1]][-4:]
        return orig_eq(self, a, b)

    Asm.eq = eq_spy
    try:
        prog = pr.lift_rv32im(po2)
    finally:
        Asm.eq = orig_eq
    print(f"program: {prog.code_rows} rows")

    from risc0_tpu.circuit.recursion.predicates import own_control_ids
    _ids, root = own_control_ids()
    tape = [int(w) for w in np.asarray(root, np.uint32)]
    tape += [int(w) for w in seal]

    pf = RecursionPreflight(tape, eq_strict=False)
    pf.run(prog.code)
    fails = pf.eq_failures
    print(f"{len(fails)} EQ failures")
    for item in fails[:10]:
        cycle = item[0] if isinstance(item, tuple) else item
        print(f"  cycle {cycle}:")
        # emission rows == code rows (one row per cycle)
        for line in sites.get(cycle, ["<no site recorded>"]):
            print(f"    {line}")
        if isinstance(item, tuple) and len(item) > 1:
            print(f"    values: {item[1:]}")


if __name__ == "__main__":
    main()
