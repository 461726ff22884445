"""Generate vendored recursion-seal fixtures: lift the committed rv32im
po2=14 seal into a succinct receipt (and optionally wrap with
identity_p254), saving the seals under tests/data/ so fast tests can
preflight-check join/resolve/identity without a full prove.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/gen_recursion_seals.py [--cpu] [--p254]
"""

import argparse
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--p254", action="store_true")
    ap.add_argument("--union", action="store_true",
                    help="freeze a union receipt of two lifted seals")
    ap.add_argument("--keccak", action="store_true",
                    help="freeze a keccak-lift succinct receipt")
    a = ap.parse_args()

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    print("device:", jax.devices()[0])

    from risc0_tpu.circuit.rv32im.claim import decode_claim
    from risc0_tpu.zkvm.receipt import SegmentReceipt
    from risc0_tpu.zkvm.recursion_driver import identity_p254, lift

    seal = np.load(os.path.join(REPO, "tests/data/rv32im_seal_po2_14.npy"))
    sr = SegmentReceipt(seal=seal, index=0, hashfn="poseidon2",
                        claim=decode_claim(seal))
    def save(receipt, stem):
        np.save(os.path.join(REPO, f"tests/data/{stem}.npy"),
                np.asarray(receipt.seal, np.uint32))
        proof = receipt.control_inclusion_proof
        np.savez(os.path.join(REPO, f"tests/data/{stem}.meta.npz"),
                 control_id=np.asarray(receipt.control_id, np.uint32),
                 control_root=np.asarray(receipt.control_root, np.uint32),
                 incl_index=np.asarray(proof["index"]),
                 incl_digests=np.stack([np.asarray(d, np.uint32)
                                        for d in proof["digests"]]))

    t0 = time.time()
    receipt = lift(sr)
    print(f"lift: {time.time()-t0:.1f}s seal_words={len(receipt.seal)}")
    save(receipt, "recursion_seal_lift14")

    if a.p254:
        t0 = time.time()
        p254 = identity_p254(receipt)
        print(f"identity_p254: {time.time()-t0:.1f}s "
              f"seal_words={len(p254.seal)}")
        save(p254, "p254_seal_identity")

    if a.union:
        from risc0_tpu.zkvm.recursion_driver import union

        t0 = time.time()
        u = union(receipt, receipt)   # union of (lift14, lift14)
        print(f"union: {time.time()-t0:.1f}s seal_words={len(u.seal)}")
        save(u, "union_seal_lift14x2")

    if a.keccak:
        from risc0_tpu.circuit.keccak.prove import prove_keccak
        from risc0_tpu.zkvm.recursion_driver import lift_keccak

        rng = np.random.default_rng(14)
        perms = [[int(x) for x in rng.integers(0, 1 << 64, 25,
                                               dtype=np.uint64)]
                 for _ in range(2)]
        t0 = time.time()
        kseal = prove_keccak(perms, 14)
        kr = lift_keccak(np.asarray(kseal, np.uint32), 14)
        print(f"keccak+lift: {time.time()-t0:.1f}s "
              f"seal_words={len(kr.seal)}")
        save(kr, "keccak_lift14_seal")
    print("done")


if __name__ == "__main__":
    main()
