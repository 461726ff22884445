"""Driver benchmark — runs on real TPU hardware (axon backend by default).

Measures the round-1 headline kernel path from BASELINE.json: batch iNTT +
zk-shift + 4x LDE + Poseidon2 Merkle commit (the inner loop of segment
proving, reference risc0/zkp/src/prove/prover.rs:81-108), plus a 2^24-element
NTT, plus the rv32im executor in MHz.  Prints ONE JSON line.

Timing notes: through the axon relay, `block_until_ready` is unreliable, so
every sample forces a device->host readback of a value that depends on the
full result, and we report the min over N trials.

vs_baseline: the reference publishes no in-tree numbers (BASELINE.md); 1.0
records "no recorded baseline yet" until BENCH_r1.json exists.
"""

import json
import time

import numpy as np


def _bench(fn, x, iters=5):
    def sync(y):
        # scalar readback of the last element forces full completion
        return np.asarray(y[tuple(d - 1 for d in y.shape)])

    sync(fn(x))  # warm (compile)
    times = []
    for _i in range(iters):
        t = time.perf_counter()
        sync(fn(x))
        times.append((time.perf_counter() - t) * 1e3)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    from risc0_tpu import field as F
    from risc0_tpu.hal import jnp_hal as hal
    from risc0_tpu.core import ntt

    rng = np.random.default_rng(0)

    # --- config A: full commit-group pipeline at po2=16, 16 columns ----------
    witness = jnp.asarray(
        rng.integers(0, F.P, size=(16, 1 << 16), dtype=np.uint32))
    commit = jax.jit(lambda w: hal.merkle_layers(
        hal.expand_evaluate(hal.make_coeffs(w), 2))[-1])
    commit_ms = _bench(commit, witness)

    # --- config B: 2^24-element NTT (16 x 2^20 batch) ------------------------
    big = jnp.asarray(rng.integers(0, F.P, size=(16, 1 << 20), dtype=np.uint32))
    fwd = jax.jit(lambda x: ntt.evaluate_ntt(x))
    ntt_ms = _bench(fwd, big)

    # --- config C: rv32im executor MHz (reference datasheet execute metric) --
    exec_mhz = None
    try:
        from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

        elf = open("/root/repo/guests/loop.bin", "rb").read()
        count = 1024 * 494 + 817
        env = ExecutorEnv(segment_po2=20).write_slice(
            count.to_bytes(4, "little"))
        t = time.perf_counter()
        s = ExecutorImpl(env, elf).run()
        exec_mhz = round(s.user_cycles / (time.perf_counter() - t) / 1e6, 1)
    except Exception:
        pass

    total_ms = commit_ms + ntt_ms
    print(json.dumps({
        "metric": "2^24-elem NTT + po2=16x16col commit (iNTT+zkshift+LDE+Poseidon2 merkle)",
        "value": round(total_ms, 2),
        "unit": "ms",
        "vs_baseline": 1.0,
        "detail": {
            "commit_ms": round(commit_ms, 2),
            "ntt_2e24_ms": round(ntt_ms, 2),
            "execute_mhz": exec_mhz,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
