"""Produce the first Groth16Receipt of a REAL recursion identity_p254 seal
(VERDICT r3 item 3): build the stark_verify R1CS over the frozen
tests/data/p254_seal_identity.npy fixture (a genuine identity_p254 wrap of
an rv32im po2=14 segment proof), report the constraint count, generate (or
load) the CRS, prove with the in-repo Groth16 prover, verify the proof +
the receipt, and append the evidence to E2E_RESULTS.md.

Reference chain being matched: identity_p254 -> seal_to_json -> circom
stark_verify witness -> rapidsnark (risc0/groth16/src/prove/docker.rs:34-75,
groth16_proof/groth16/stark_verify.circom).

    PYTHONPATH=/root/repo python scripts/record_groth16_real.py [--threads N]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import resource
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "E2E_RESULTS.md")


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=0)
    ap.add_argument("--no-record", action="store_true")
    ap.add_argument("--golden", action="store_true",
                    help="freeze the receipt to tests/data/"
                         "groth16_receipt_golden.npz")
    a = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from risc0_tpu.groth16 import wrap as W
    from risc0_tpu.groth16.prove import prove
    from risc0_tpu.groth16.verifier import Verifier, proof_json_to_seal
    from risc0_tpu.zkvm.receipt import (Groth16Receipt, SuccinctReceipt,
                                        VerifierContext)
    from risc0_tpu.circuit.rv32im.claim import decode_claim

    data = os.path.join(REPO, "tests", "data")
    seal = np.load(os.path.join(data, "p254_seal_identity.npy"))
    meta = np.load(os.path.join(data, "p254_seal_identity.meta.npz"))
    segment_seal = np.load(os.path.join(data, "rv32im_seal_po2_14.npy"))

    print("building stark_verify R1CS over the identity_p254 seal "
          f"({len(seal)} words)...", flush=True)
    t0 = time.time()
    builder = W.build_circuit(seal)
    t_build = time.time() - t0
    n_cons = builder.cs.num_constraints
    n_vars = builder.cs.num_vars
    print(f"built: {n_cons} constraints, {n_vars} witness vars, "
          f"{t_build:.1f}s, rss {rss_gb():.1f} GB", flush=True)

    t0 = time.time()
    pk, vk = W.ensure_crs(builder, n_threads=a.threads)
    t_crs = time.time() - t0
    print(f"CRS ready: {t_crs:.1f}s (cached under {W.crs_dir()}), "
          f"rss {rss_gb():.1f} GB", flush=True)

    t0 = time.time()
    proof = prove(pk, builder.cs, n_threads=a.threads)
    t_prove = time.time() - t0
    print(f"proved: {t_prove:.1f}s, rss {rss_gb():.1f} GB", flush=True)

    # raw pairing check of the proof JSON against the vk
    v = Verifier(
        (int(proof["pi_a"][0]), int(proof["pi_a"][1])),
        ((int(proof["pi_b"][0][0]), int(proof["pi_b"][0][1])),
         (int(proof["pi_b"][1][0]), int(proof["pi_b"][1][1]))),
        (int(proof["pi_c"][0]), int(proof["pi_c"][1])),
        [int(x) for x in proof["public"]], vk)
    assert v.verify(), "groth16 pairing check failed"
    print("pairing check: OK", flush=True)

    # full receipt path: Groth16Receipt.verify_integrity
    p254 = SuccinctReceipt(
        seal=seal, control_id=meta["control_id"],
        claim=decode_claim(segment_seal),
        control_root=meta["control_root"],
        control_inclusion_proof={"index": int(meta["incl_index"]),
                                 "digests": meta["incl_digests"]},
        hashfn="poseidon254")
    seal_bytes = proof_json_to_seal(proof)
    params = W.verifier_parameters(vk)
    receipt = Groth16Receipt(seal=seal_bytes, claim=p254.claim,
                             verifier_parameters=params.digest())
    receipt.verify_integrity(VerifierContext(groth16_params=params))
    print("Groth16Receipt.verify_integrity: OK", flush=True)

    if a.golden:
        from risc0_tpu.groth16 import native as nat

        path = os.path.join(data, "groth16_receipt_golden.npz")
        np.savez(path,
                 seal=np.frombuffer(bytes(seal_bytes), np.uint8),
                 verifier_parameters=receipt.verifier_parameters,
                 claim_digest=p254.claim.digest(),
                 # embed the dev-ceremony vk so the golden verifies on
                 # machines without the local CRS cache
                 vk_alpha_g1=nat.g1_arr([vk.alpha_g1]),
                 vk_beta_g2=nat.g2_arr([vk.beta_g2]),
                 vk_gamma_g2=nat.g2_arr([vk.gamma_g2]),
                 vk_delta_g2=nat.g2_arr([vk.delta_g2]),
                 vk_ic=nat.g1_arr(vk.ic))
        print(f"golden receipt frozen: {path}", flush=True)

    total = t_build + t_crs + t_prove
    line = (f"| {datetime.datetime.utcnow():%Y-%m-%d %H:%M} | "
            f"Groth16Receipt of real identity_p254 seal "
            f"({n_cons} constraints; build {t_build:.0f}s + CRS "
            f"{t_crs:.0f}s + prove {t_prove:.0f}s) | cpu | "
            f"{total/60:.1f} min | PASS |")
    print(line)
    if not a.no_record:
        with open(RESULTS, "a") as f:
            f.write(line + "\n")
    summary = {"constraints": n_cons, "vars": n_vars,
               "build_s": round(t_build, 1), "crs_s": round(t_crs, 1),
               "prove_s": round(t_prove, 1), "rss_gb": round(rss_gb(), 1)}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
