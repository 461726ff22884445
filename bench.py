"""Driver benchmark — runs on real TPU hardware (axon backend by default).

Measures the round-1 headline kernel path from BASELINE.json: batch iNTT +
zk-shift + 4x LDE + Poseidon2 Merkle commit (the inner loop of segment
proving, reference risc0/zkp/src/prove/prover.rs:81-108), plus a 2^24-point
NTT.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference publishes no in-tree numbers (BASELINE.md), so we
report against our own first-round CPU-estimate denominator of 1.0 until a
recorded baseline exists in BENCH_r1.json.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from risc0_tpu import field as F
    from risc0_tpu.hal import jnp_hal as hal
    from risc0_tpu.hash import poseidon2 as p2
    from risc0_tpu.core import ntt

    rng = np.random.default_rng(0)

    # --- config A: commit-group pipeline at po2=16, 16 columns ---------------
    po2 = 16
    cols = 16
    witness = jnp.asarray(
        rng.integers(0, F.P, size=(cols, 1 << po2), dtype=np.uint32))

    @jax.jit
    def commit(w):
        coeffs = hal.make_coeffs(w)
        evaluated = hal.expand_evaluate(coeffs, 2)
        layers = hal.merkle_layers(evaluated)
        return layers[-1]

    np.asarray(commit(witness))  # compile + warmup
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        # fold the result back into the input so iterations can't be elided,
        # and force a device->host readback as the sync point
        witness = witness.at[0, 0].set(commit(witness)[0, 0])
    np.asarray(witness[0, 0])
    commit_ms = (time.perf_counter() - t0) / iters * 1e3

    # --- config B: 2^24-point NTT (batched as 16 x 2^20 rows) ---------------
    big = jnp.asarray(rng.integers(0, F.P, size=(16, 1 << 20), dtype=np.uint32))

    @jax.jit
    def ntt_roundtrip(x):
        return ntt.evaluate_ntt(ntt.interpolate_ntt(x))

    np.asarray(ntt_roundtrip(big)[0, 0])  # compile + warmup
    t0 = time.perf_counter()
    for i in range(iters):
        big = ntt_roundtrip(big)
    np.asarray(big[0, 0])
    ntt_ms = (time.perf_counter() - t0) / iters * 1e3 / 2  # one direction

    total_ms = commit_ms + ntt_ms
    print(json.dumps({
        "metric": "2^24-elem NTT + po2=16x16col Merkle commit wall-clock",
        "value": round(total_ms, 2),
        "unit": "ms",
        "vs_baseline": 1.0,
        "detail": {"commit_ms": round(commit_ms, 2), "ntt_ms": round(ntt_ms, 2),
                   "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
