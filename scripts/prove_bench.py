"""Stage-timed rv32im segment prove benchmark.

Measures the BASELINE headline metric (guest cycles proved/sec/chip, ref
`risc0/zkvm/examples/datasheet.rs:42-148`): executes the loop guest to fill a
segment at the requested po2, proves it (warm iter reported; first iter pays
jit compiles), prints the per-stage perf-scope table and one JSON line.

    python scripts/prove_bench.py --po2 16          # real TPU (axon)
    python scripts/prove_bench.py --po2 16 --cpu    # jax CPU backend
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


# loop guest: ~2.02 cycles per iteration + ~13k fixed/paging cycles; the
# segment po2 is the cycle count rounded up to a power of two, so aim for
# ~70% fill of the target po2 (segment_po2 is only the split threshold).
def _count_for_po2(po2: int) -> int:
    return max(1, int((0.70 * (1 << po2) - 13000) / 2.02))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--po2", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--skip-verify", action="store_true")
    a = ap.parse_args()

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: the big eval_check/commit graphs take tens of
    # minutes through the remote compile service; cache across processes
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    dev = str(jax.devices()[0])

    from risc0_tpu import perf
    from risc0_tpu.circuit.rv32im.prove import prove_segment
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

    elf = open("/root/repo/guests/loop.bin", "rb").read()
    count = _count_for_po2(a.po2)
    env = ExecutorEnv(segment_po2=max(a.po2, 16)).write_slice(
        count.to_bytes(4, "little"))
    t0 = time.perf_counter()
    sess = ExecutorImpl(env, elf).run()
    texec = time.perf_counter() - t0
    seg = sess.segments[0]
    print(f"device={dev}")
    print(f"segment po2={seg.po2} user_cycles={sess.user_cycles} "
          f"exec={texec:.2f}s ({sess.user_cycles/texec/1e6:.1f} MHz)")
    if seg.po2 != a.po2:
        print(f"WARNING: got po2={seg.po2}, wanted {a.po2}")

    rng = np.random.default_rng(7)
    t0 = time.perf_counter()
    seal = prove_segment(seg, rng=rng)
    warm = time.perf_counter() - t0
    print(f"\nwarm iter (incl jit compiles): {warm:.1f}s")
    print(perf.summary(min_ms=5))
    perf.reset()

    best = None
    total_timed = 0.0
    for i in range(a.iters):
        t0 = time.perf_counter()
        seal = prove_segment(seg, rng=rng)
        dt = time.perf_counter() - t0
        print(f"iter {i}: {dt:.2f}s")
        total_timed += dt
        best = dt if best is None or dt < best else best

    print("\nper-stage (all iters):")
    print(perf.summary(min_ms=5))
    unscoped = total_timed - perf.toplevel_seconds()
    print(f"{unscoped * 1e3:10.1f} ms          (unscoped host/dispatch"
          f" gap across {a.iters} iters)")

    if not a.skip_verify:
        from risc0_tpu.circuit.rv32im.verify import verify_rv32im_seal
        verify_rv32im_seal(seal)
        print("seal verified")

    cycles = 1 << seg.po2
    print(json.dumps({
        "po2": seg.po2,
        "prove_s": round(best, 3),
        "cycles_per_s": round(cycles / best),
        "user_cycles_per_s": round(sess.user_cycles / best),
        "seal_words": len(seal),
        "device": dev,
        "device_memory": perf.device_memory(),  # peak HBM (MemoryTracker)
    }))


if __name__ == "__main__":
    main()
