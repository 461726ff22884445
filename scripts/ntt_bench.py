"""On-chip NTT A/B: XLA per-stage NTT (core/ntt.py) vs the fused
two-pass Pallas NTT (hal/pallas/ntt.py) at prover shapes, asserting
bit-exact equality and timing both (VERDICT r2 weak-4: validate the
Pallas NTT on hardware and put it in the measured path).

Timing through the axon relay syncs via a result-dependent scalar
readback (block_until_ready is unreliable there).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/ntt_bench.py [--cpu]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _sync(x):
    """Force completion: read back a value that depends on the result."""
    return int(np.asarray(x[0, :1])[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
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
    from risc0_tpu.core import ntt as xla_ntt
    from risc0_tpu.hal.pallas import ntt as pl_ntt

    interp = a.cpu  # pallas on CPU needs interpret mode
    rows = []
    # prover shapes: (batch cols, 2^po2 rows); data group at po2=16..20
    for batch, po2 in ((64, 16), (64, 18), (16, 20), (4, 22)):
        rng = np.random.default_rng(po2)
        x = jnp.asarray(
            rng.integers(0, F.P, size=(batch, 1 << po2), dtype=np.uint32))

        fx = jax.jit(lambda v: xla_ntt.evaluate_ntt(v))
        fp = jax.jit(lambda v: pl_ntt.evaluate_ntt(v, interpret=interp))
        rx, rp = fx(x), fp(x)
        assert np.array_equal(np.asarray(rx), np.asarray(rp)), \
            f"MISMATCH at batch={batch} po2={po2}"
        _sync(rx), _sync(rp)

        def best_of(f, v, iters):
            b = None
            for _ in range(iters):
                t0 = time.perf_counter()
                _sync(f(v))
                dt = time.perf_counter() - t0
                b = dt if b is None or dt < b else b
            return b

        tx = best_of(fx, x, a.iters)
        tp = best_of(fp, x, a.iters)
        words = batch << po2
        rows.append({"batch": batch, "po2": po2,
                     "xla_ms": round(tx * 1e3, 2),
                     "pallas_ms": round(tp * 1e3, 2),
                     "speedup": round(tx / tp, 2),
                     "xla_gwords_s": round(words / tx / 1e9, 2),
                     "pallas_gwords_s": round(words / tp / 1e9, 2)})
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"bitexact": True, "rows": rows}))


if __name__ == "__main__":
    main()
