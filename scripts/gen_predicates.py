"""Generate the self-authored recursion predicate programs and our
allowed-control-IDs set (reference ships these as recursion_zkr.zip +
control_id.rs; xtask bootstrap regenerates them — this script is our
equivalent).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/gen_predicates.py [--po2s 14,15,16] [--join]

Writes risc0_tpu/circuit/recursion/data/zkr/{lift_rv32im_N,join}.zkr.xz and
data/own_control_ids.npz (IDs + allowed root).
"""

import argparse
import lzma
import os
import sys
import time

import numpy as np


def save(prog, path):
    raw = prog.code.astype(np.uint32).tobytes()
    with lzma.open(path, "wb", preset=6) as f:
        f.write(raw)
    print(f"  wrote {path} ({prog.code_rows} rows)")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--po2s", default="14")
    ap.add_argument("--join", action="store_true")
    a = ap.parse_args()

    from risc0_tpu.circuit.recursion import predicates as pr

    zkr_dir = os.path.join(os.path.dirname(pr.__file__), "data", "zkr")
    data_dir = os.path.join(os.path.dirname(pr.__file__), "data")
    os.makedirs(zkr_dir, exist_ok=True)

    names, ids = [], []
    for po2 in [int(x) for x in a.po2s.split(",") if x]:
        t0 = time.time()
        prog = pr.lift_rv32im(po2)
        name = f"lift_rv32im_{po2}"
        save(prog, os.path.join(zkr_dir, name + ".zkr.xz"))
        cid = prog.control_id()
        names.append(name)
        ids.append(np.asarray(cid, np.uint32))
        print(f"  {name}: control_id {bytes(cid.tobytes()).hex()} "
              f"({time.time()-t0:.0f}s)")

    if a.join:
        t0 = time.time()
        prog = pr.join()
        save(prog, os.path.join(zkr_dir, "join.zkr.xz"))
        cid = prog.control_id()
        names.append("join")
        ids.append(np.asarray(cid, np.uint32))
        print(f"  join: control_id {bytes(cid.tobytes()).hex()} "
              f"({time.time()-t0:.0f}s)")

    # merge with any existing own-IDs file (incremental regeneration)
    out_path = os.path.join(data_dir, "own_control_ids.npz")
    existing = {}
    if os.path.exists(out_path):
        z = np.load(out_path, allow_pickle=True)
        existing = dict(zip([str(n) for n in z["names"]], z["ids"]))
    existing.update(dict(zip(names, ids)))
    from risc0_tpu.circuit.recursion.prove import MerkleGroup
    all_names = sorted(existing)
    all_ids = np.stack([existing[n] for n in all_names])
    root = MerkleGroup(list(all_ids)).calc_root()
    np.savez(out_path, names=np.array(all_names), ids=all_ids, root=root)
    print(f"own allowed root: {bytes(root.tobytes()).hex()} "
          f"({len(all_names)} programs)")


if __name__ == "__main__":
    main()
