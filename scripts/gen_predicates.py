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
    ap.add_argument("--po2s", default="")
    ap.add_argument("--povw-po2s", default="",
                    help="generate lift_rv32im_povw_{po2} programs")
    ap.add_argument("--join", action="store_true")
    ap.add_argument("--resolve", action="store_true")
    ap.add_argument("--identity", action="store_true")
    ap.add_argument("--union", action="store_true")
    ap.add_argument("--povw", action="store_true",
                    help="join_povw/join_unwrap_povw/unwrap_povw/"
                         "resolve_povw/resolve_unwrap_povw")
    ap.add_argument("--keccak", action="store_true")
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

    for po2 in [int(x) for x in a.povw_po2s.split(",") if x]:
        t0 = time.time()
        prog = pr.lift_rv32im_povw(po2)
        name = f"lift_rv32im_povw_{po2}"
        save(prog, os.path.join(zkr_dir, name + ".zkr.xz"))
        cid = prog.control_id()
        names.append(name)
        ids.append(np.asarray(cid, np.uint32))
        print(f"  {name}: control_id {bytes(cid.tobytes()).hex()} "
              f"({time.time()-t0:.0f}s)")

    for flag, name, build in (
        (a.join, "join", pr.join),
        (a.resolve, "resolve", pr.resolve),
        (a.identity, "identity", pr.identity),
        (a.union, "union", pr.union),
        (a.povw, "join_povw", pr.join_povw),
        (a.povw, "join_unwrap_povw", lambda: pr.join_povw(unwrap=True)),
        (a.povw, "unwrap_povw", pr.unwrap_povw),
        (a.povw, "resolve_povw", pr.resolve_povw),
        (a.povw, "resolve_unwrap_povw",
         lambda: pr.resolve_povw(unwrap=True)),
    ):
        if not flag:
            continue
        t0 = time.time()
        prog = build()
        save(prog, os.path.join(zkr_dir, name + ".zkr.xz"))
        cid = prog.control_id()
        names.append(name)
        ids.append(np.asarray(cid, np.uint32))
        print(f"  {name}: control_id {bytes(cid.tobytes()).hex()} "
              f"({time.time()-t0:.0f}s)")

    if a.keccak:
        # released keccak_lift programs join the allowed set so keccak
        # coprocessor receipts can be unioned/resolved (reference
        # control_id.rs ALLOWED_CONTROL_IDS includes them)
        from risc0_tpu.circuit.recursion.prove import load_keccak_lift

        for po2 in range(14, 19):
            t0 = time.time()
            prog = load_keccak_lift(po2)
            cid = prog.control_id()
            names.append(f"keccak_lift_{po2}")
            ids.append(np.asarray(cid, np.uint32))
            print(f"  keccak_lift_{po2}: control_id "
                  f"{bytes(cid.tobytes()).hex()} ({time.time()-t0:.0f}s)")

    p254_id = None
    if a.identity:
        # BN254_IDENTITY_CONTROL_ID equivalent: the identity program's code
        # commitment under the poseidon254 suite (control_id.rs:28-33)
        t0 = time.time()
        p254_id = pr.load_own_program("identity").control_id("poseidon254")
        print(f"  identity p254 control_id "
              f"{bytes(p254_id.tobytes()).hex()} ({time.time()-t0:.0f}s)")

    # merge with any existing own-IDs file (incremental regeneration)
    out_path = os.path.join(data_dir, "own_control_ids.npz")
    existing = {}
    extra = {}
    if os.path.exists(out_path):
        z = np.load(out_path, allow_pickle=True)
        existing = dict(zip([str(n) for n in z["names"]], z["ids"]))
        extra = {k: z[k] for k in z.files
                 if k not in ("names", "ids", "root")}
    existing.update(dict(zip(names, ids)))
    if p254_id is not None:
        extra["identity_p254"] = np.asarray(p254_id, np.uint32)
    from risc0_tpu.circuit.recursion.prove import MerkleGroup
    all_names = sorted(existing)
    all_ids = np.stack([existing[n] for n in all_names])
    root = MerkleGroup(list(all_ids)).calc_root()
    np.savez(out_path, names=np.array(all_names), ids=all_ids, root=root,
             **extra)
    print(f"own allowed root: {bytes(root.tobytes()).hex()} "
          f"({len(all_names)} programs)")


if __name__ == "__main__":
    main()
