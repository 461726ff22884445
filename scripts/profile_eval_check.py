"""Profile the rv32im eval_check device kernel in isolation.

check_commit dominates the segment prove (59% at po2=18, r3 bench); this
times make_eval_check per chunk size with forced device->host syncs (the
seal readback trick — block_until_ready is unreliable through the relay).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_eval_check.py --po2 16 --chunks 13,14,15
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--po2", type=int, default=16)
    ap.add_argument("--chunks", default="13,14,15")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    print("device:", jax.devices()[0], flush=True)

    from risc0_tpu import field as F
    from risc0_tpu.circuit import ir_range
    from risc0_tpu.circuit.rv32im.circuit import load_circuit

    c = load_circuit()
    plan = ir_range.build_range_plan(c)
    c.range_plan = plan

    po2 = a.po2
    domain = (1 << po2) * 4
    rng = np.random.default_rng(0)
    accum = rng.integers(0, F.P, (103, domain), dtype=np.uint32)
    data = rng.integers(0, F.P, (211, domain), dtype=np.uint32)
    code = rng.integers(0, F.P, (15, domain), dtype=np.uint32)
    bufmap = {0: accum, 1: data, 4: code}
    evs = tuple(jnp.asarray(bufmap[b]) for b in ir_range.plan_buf_ids(plan))
    gvals = jnp.asarray(rng.integers(0, F.P, len(plan.global_specs),
                                     dtype=np.uint32))
    pm_pows = jnp.asarray(c.mix_pows(tuple(
        int(x) for x in rng.integers(0, F.P, 4))))

    ref = None
    for ch in (int(x) for x in a.chunks.split(",")):
        fn = ir_range.make_eval_check(c, po2, chunk=1 << ch)
        t0 = time.perf_counter()
        out = np.asarray(fn(evs, gvals, pm_pows))  # forces full readback
        warm = time.perf_counter() - t0
        best = 1e9
        for _ in range(a.iters):
            t0 = time.perf_counter()
            out = np.asarray(fn(evs, gvals, pm_pows))
            best = min(best, time.perf_counter() - t0)
        if ref is None:
            ref = out
        else:
            assert np.array_equal(ref, out), f"chunk 2^{ch} output differs!"
        gbs = 19000 * domain * 12 / best / 1e9  # rough op-bandwidth model
        print(f"chunk=2^{ch}: warm {warm:.1f}s best {best:.3f}s "
              f"(~{gbs:.0f} GB/s op-traffic)", flush=True)


if __name__ == "__main__":
    main()
