"""Debug harness for join predicate EQ failures: rebuild the exact join
input tape from saved artifacts (two lifted recursion seals + the two
segment seals for their claims), run the recursion-VM PREFLIGHT with
eq_strict off, and map every failing EQ row to its emission site.

    PYTHONPATH=/root/repo python scripts/debug_join.py \
        lift0.npy lift1.npy seg0.npy seg1.npy
"""

from __future__ import annotations

import sys
import traceback

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    lift0 = np.load(sys.argv[1])
    lift1 = np.load(sys.argv[2])
    seg0 = np.load(sys.argv[3])
    seg1 = np.load(sys.argv[4])

    from risc0_tpu.circuit.recursion import predicates as pr
    from risc0_tpu.circuit.recursion.asm import Asm
    from risc0_tpu.circuit.recursion.preflight import RecursionPreflight
    from risc0_tpu.circuit.recursion.prove import MerkleGroup
    from risc0_tpu.circuit.rv32im.claim import decode_claim
    from risc0_tpu.zkvm.recursion_driver import (_allowed, _claim_body_words,
                                                 _proof_words)

    sites = {}
    orig_eq = Asm.eq

    def eq_spy(self, a, b):
        row = len(self.rows)
        st = traceback.extract_stack(limit=10)
        sites[row] = [f"{f.filename.split('/')[-1]}:{f.lineno} {f.name}"
                      for f in st[:-1]][-5:]
        return orig_eq(self, a, b)

    Asm.eq = eq_spy
    try:
        prog = pr.join()
    finally:
        Asm.eq = orig_eq
    print(f"join program: {prog.code_rows} rows")

    ids, leaves, root = _allowed()
    group = MerkleGroup(leaves)
    po2 = int(seg0[91])
    cid = ids[f"lift_rv32im_{po2}"]
    tape = [int(w) for w in np.asarray(root, np.uint32)]
    for seal, seg in ((lift0, seg0), (lift1, seg1)):
        tape += _proof_words(group, cid)
        tape += [int(w) for w in np.asarray(seal, np.uint32)]
        tape += _claim_body_words(decode_claim(seg))

    pf = RecursionPreflight(tape, eq_strict=False)
    try:
        pf.run(prog.code)
    except Exception as e:
        print("preflight aborted:", e)
    fails = pf.eq_failures
    print(f"{len(fails)} EQ failures")
    import bisect
    keys = sorted(sites)
    for cycle, a, b in fails[:12]:
        i = bisect.bisect_right(keys, cycle) - 1
        print(f"  cycle {cycle}: {a} != {b}")
        for line in sites[keys[i]][-3:]:
            print(f"      {line}")


if __name__ == "__main__":
    main()
