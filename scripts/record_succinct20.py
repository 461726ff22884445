"""Recorded DEFAULT-SIZE succinct chain e2e (VERDICT r2 item 1): run a
real session at the executor default segment_po2=20, prove every segment
on the chip, lift each with lift_rv32im_20, join the lifted receipts,
and verify the final succinct receipt — then append the evidence to
E2E_RESULTS.md.  This is the reference capability
(risc0/circuit/recursion/src/control_id.rs lift_rv32im_v2_{14..22} +
zkvm compress) exercised at the default segment size, not a po2<=16 demo.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/record_succinct20.py [--cpu] [--po2 N] [--segments M]
"""

from __future__ import annotations

import argparse
import datetime
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "E2E_RESULTS.md")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--po2", type=int, default=20)
    ap.add_argument("--segments", type=int, default=2,
                    help="how many segments the session should split into")
    a = ap.parse_args()

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    dev = str(jax.devices()[0])
    print("device:", dev, flush=True)

    from risc0_tpu.circuit.rv32im.prove import prove_segment
    from risc0_tpu.circuit.rv32im.verify import verify_rv32im_seal
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl
    from risc0_tpu.zkvm.receipt import SegmentReceipt, VerifierContext
    from risc0_tpu.zkvm.recursion_driver import join, lift
    from risc0_tpu.circuit.rv32im.claim import decode_claim

    # loop guest sized to fill `segments` segments at this po2
    elf = open(os.path.join(REPO, "guests", "loop.bin"), "rb").read()
    fill = 0.70 + 0.95 * (a.segments - 1)  # ~70% of the last + full rest
    count = max(1, int((fill * (1 << a.po2) - 13000) / 2.02))
    env = ExecutorEnv(segment_po2=a.po2).write_slice(
        count.to_bytes(4, "little"))
    t0 = time.time()
    session = ExecutorImpl(env, elf).run()
    t_exec = time.time() - t0
    segs = session.segments
    print(f"executed: {session.user_cycles} user cycles, "
          f"{len(segs)} segments, po2s="
          f"{[s.po2 for s in segs]} in {t_exec:.1f}s", flush=True)

    rng = np.random.default_rng(20)
    stages = []
    lifted = []
    seal_dir = os.environ.get("RISC0_SUCCINCT20_SEAL_DIR", "/tmp/r4logs")
    for i, seg in enumerate(segs):
        t0 = time.time()
        seal = prove_segment(seg, rng=rng)
        t_prove = time.time() - t0
        verify_rv32im_seal(seal)
        # persist each seal so a downstream failure (or transient device
        # fault) keeps the expensive artifact for scripts/debug_lift.py
        try:
            np.save(os.path.join(seal_dir, f"succinct20_seg{i}.npy"),
                    np.asarray(seal, np.uint32))
        except OSError:
            pass
        stages.append((f"segment {i} prove+verify (po2={seg.po2})",
                       t_prove, len(seal)))
        print(f"segment {i}: proved po2={seg.po2} in {t_prove:.1f}s "
              f"({(1 << seg.po2) / t_prove:,.0f} cycles/s), seal "
              f"{len(seal)} words, verified", flush=True)
        sr = SegmentReceipt(seal=np.asarray(seal, np.uint32), index=i,
                            hashfn="poseidon2", claim=decode_claim(seal))
        t0 = time.time()
        lr = lift(sr)
        t_lift = time.time() - t0
        try:
            np.save(os.path.join(seal_dir, f"succinct20_lift{i}.npy"),
                    np.asarray(lr.seal, np.uint32))
        except OSError:
            pass
        lr.verify_integrity(VerifierContext(control_root=lr.control_root))
        stages.append((f"segment {i} lift_rv32im_{seg.po2}+verify",
                       t_lift, len(lr.seal)))
        print(f"segment {i}: lifted in {t_lift:.1f}s, succinct seal "
              f"{len(lr.seal)} words, verified", flush=True)
        lifted.append(lr)

    final = lifted[0]
    for i, nxt in enumerate(lifted[1:], 1):
        t0 = time.time()
        final = join(final, nxt)
        t_join = time.time() - t0
        final.verify_integrity(
            VerifierContext(control_root=final.control_root))
        stages.append((f"join {i}+verify", t_join, len(final.seal)))
        print(f"join {i}: {t_join:.1f}s, verified", flush=True)

    # the rolled-up claim must equal the session claim
    from risc0_tpu.zkvm.receipt import session_claim
    want = session_claim(session).digest()
    got = final.claim.digest()
    assert np.array_equal(got, want), "joined claim != session claim"
    print("final succinct receipt claim == session claim ✓", flush=True)

    date = datetime.datetime.utcnow().strftime("%Y-%m-%d %H:%M")
    with open(RESULTS, "a") as f:
        f.write(f"\n## Default-size succinct chain (po2={a.po2}, "
                f"{len(segs)} segments) — {date} UTC, {dev}\n\n"
                f"`scripts/record_succinct20.py --po2 {a.po2} --segments "
                f"{a.segments}`: session of {session.user_cycles:,} user "
                f"cycles -> per-segment STARK prove -> lift_rv32im_{a.po2} "
                f"-> join -> succinct receipt verified; final claim digest "
                f"== session claim digest.\n\n"
                f"| stage | runtime | seal words |\n|---|---|---|\n")
        for name, dt, words in stages:
            f.write(f"| {name} | {dt:.1f} s | {words} |\n")
    print(f"recorded to {RESULTS}", flush=True)


if __name__ == "__main__":
    main()
