"""cProfile the host side of one segment prove (diagnosis harness for
the unscoped wall-time between perf scopes).

    python scripts/profile_prove.py --po2 14 [--cpu] [--top 30]
"""

import argparse
import cProfile
import io
import pstats
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--po2", type=int, default=14)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    a = ap.parse_args()

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import numpy as np

    from risc0_tpu import perf
    from risc0_tpu.circuit.rv32im.prove import prove_segment
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

    elf = open("/root/repo/guests/loop.bin", "rb").read()
    count = max(1, int((0.70 * (1 << a.po2) - 13000) / 2.02))
    env = ExecutorEnv(segment_po2=max(a.po2, 16)).write_slice(
        count.to_bytes(4, "little"))
    seg = ExecutorImpl(env, elf).run().segments[0]
    rng = np.random.default_rng(7)

    prove_segment(seg, rng=rng)  # warm: compiles
    perf.reset()

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    prove_segment(seg, rng=rng)
    prof.disable()
    wall = time.perf_counter() - t0

    print(f"wall: {wall:.2f}s  (scoped: see below)")
    print(perf.summary(min_ms=5))
    out = io.StringIO()
    stats = pstats.Stats(prof, stream=out)
    stats.sort_stats("cumulative").print_stats(a.top)
    print(out.getvalue())


if __name__ == "__main__":
    main()
