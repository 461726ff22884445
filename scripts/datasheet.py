"""Datasheet harness (reference risc0/zkvm/examples/datasheet.rs:42-148):
per-operation performance table — execute MHz, prove_segment throughput
per po2 (cycles/sec + seal size), recursion lift/join, and verify times.

    python scripts/datasheet.py --po2s 16             # real TPU (axon)
    python scripts/datasheet.py --po2s 14,16 --cpu
    python scripts/datasheet.py --execute-only        # fast rows only

Writes JSON to --out (default datasheet.json) and prints a table.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _segment_at(po2: int):
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

    elf = open("/root/repo/guests/loop.bin", "rb").read()
    count = max(1, int((0.70 * (1 << po2) - 13000) / 2.02))
    env = ExecutorEnv(segment_po2=max(po2, 16)).write_slice(
        count.to_bytes(4, "little"))
    t0 = time.perf_counter()
    session = ExecutorImpl(env, elf).run()
    dt = time.perf_counter() - t0
    return session, session.segments[0], dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--po2s", default="16")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--execute-only", action="store_true")
    ap.add_argument("--recursion", action="store_true",
                    help="also measure lift/join (slow: recursion po2=18)")
    ap.add_argument("--out", default="datasheet.json")
    a = ap.parse_args()

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    rows = []
    dev = str(jax.devices()[0])

    # execute row (datasheet.rs execute: cycles/sec of the emulator)
    session, _seg, dt = _segment_at(20 if not a.execute_only else 16)
    rows.append({"op": "execute", "seconds": round(dt, 3),
                 "throughput_hz": round(session.user_cycles / dt),
                 "unit": "cycles/s"})

    if not a.execute_only:
        from risc0_tpu import perf
        from risc0_tpu.circuit.rv32im.prove import prove_segment
        from risc0_tpu.circuit.rv32im.verify import verify_rv32im_seal

        for po2 in [int(x) for x in a.po2s.split(",")]:
            _sess, seg, _ = _segment_at(po2)
            rng = np.random.default_rng(7)
            prove_segment(seg, rng=rng)  # warm (compiles)
            perf.reset()
            t0 = time.perf_counter()
            seal = prove_segment(seg, rng=rng)
            dt = time.perf_counter() - t0
            rows.append({"op": f"rv32im prove (po2={seg.po2})",
                         "seconds": round(dt, 3),
                         "throughput_hz": round((1 << seg.po2) / dt),
                         "unit": "cycles/s",
                         "seal_kb": round(len(seal) * 4 / 1024, 1)})
            t0 = time.perf_counter()
            verify_rv32im_seal(seal)
            rows.append({"op": f"rv32im verify (po2={seg.po2})",
                         "seconds": round(time.perf_counter() - t0, 3)})

        if a.recursion:
            from risc0_tpu.circuit.rv32im.claim import decode_claim
            from risc0_tpu.zkvm.receipt import SegmentReceipt
            from risc0_tpu.zkvm.recursion_driver import join, lift

            sr = SegmentReceipt(seal=seal, index=0, hashfn="poseidon2",
                                claim=decode_claim(seal))
            t0 = time.perf_counter()
            lifted = lift(sr)
            rows.append({"op": "lift", "seconds":
                         round(time.perf_counter() - t0, 3),
                         "seal_kb": round(len(lifted.seal) * 4 / 1024, 1)})
            t0 = time.perf_counter()
            join(lifted, lifted)
            rows.append({"op": "join", "seconds":
                         round(time.perf_counter() - t0, 3)})

    width = max(len(r["op"]) for r in rows)
    print(f"\ndevice: {dev}")
    for r in rows:
        extra = ""
        if "throughput_hz" in r:
            extra += f"  {r['throughput_hz']:>12,} {r['unit']}"
        if "seal_kb" in r:
            extra += f"  seal {r['seal_kb']} KB"
        print(f"  {r['op']:<{width}}  {r['seconds']:>9.3f}s{extra}")
    from risc0_tpu import perf

    with open(a.out, "w") as f:
        json.dump({"device": dev, "rows": rows,
                   "device_memory": perf.device_memory()}, f, indent=2)
    print(f"\nwritten to {a.out}")


if __name__ == "__main__":
    main()
