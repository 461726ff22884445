"""Measure the PREFLIGHT/prove-core pipeline win with the REAL prover.

Runs a multi-segment session through the scheduler twice — unsplit
(PROVE_SEGMENT does witgen + prove) and split (CPU PREFLIGHT overlaps
device prove_core) — and reports wall-clock for each (VERDICT r4 item 6
measurement; reference prove/mod.rs:79-86 + actors/worker.rs:569-592).

    PYTHONPATH=/root/repo python scripts/measure_pipeline.py \
        [--po2 16] [--segments 4] [--receipt-kind composite]

composite receipt kind skips the recursion lift/join so the measurement
isolates the segment pipeline.
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--po2", type=int, default=16)
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--receipt-kind", default="composite")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from risc0_tpu.parallel.scheduler import (Factory, ProofJob,
                                              make_local_pools)
    from risc0_tpu.zkvm.exec import ExecutorEnv
    from risc0_tpu.zkvm.prover import ProverImpl

    count = max(1, int((0.72 * a.segments * (1 << a.po2) - 13000) / 2.02))
    elf = open(os.path.join(REPO, "guests", "loop.bin"), "rb").read()

    def run(split):
        factory = Factory()
        prover = ProverImpl()
        workers = make_local_pools(factory, prover, num_cpu=1, num_accel=1)
        try:
            env = ExecutorEnv(segment_po2=a.po2).write_slice(
                count.to_bytes(4, "little"))
            job = ProofJob(factory, prover, env, elf,
                           receipt_kind=a.receipt_kind,
                           split_preflight=split)
            t0 = time.perf_counter()
            session, receipt = job.run()
            dt = time.perf_counter() - t0
            return dt, len(session.segments)
        finally:
            for w in workers:
                w.stop()

    # warm both code paths' compiles with a throwaway single-segment run
    print("warm-up run (compiles)…", flush=True)
    t_warm, _ = run(split=False)
    print(f"warm-up: {t_warm:.1f}s", flush=True)

    t_serial, n1 = run(split=False)
    print(f"serial  ({n1} segments): {t_serial:.1f}s", flush=True)
    t_split, n2 = run(split=True)
    print(f"split   ({n2} segments): {t_split:.1f}s  "
          f"({t_serial / t_split:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
