"""Driver benchmark — runs on real TPU hardware (axon backend by default).

Headline (BASELINE.json): guest cycles proved/sec/chip — a REAL rv32im
segment (loop guest) is executed, witness-generated, proved with the full
DEEP-ALI/FRI pipeline, and the seal verified.  vs_baseline compares
cycles-proved/sec against the recorded CPU-backend baseline at the same
po2 (BENCH_CPU_BASELINE.json, measured with scripts/prove_bench.py --cpu).

Knobs: RISC0_BENCH_PO2 (default 16), RISC0_BENCH_ITERS (default 1 timed
iter after the compile-warm iter).  The jit compile cache keeps reruns
hot; a cold process pays remote-compile time in the warm iter, which is
excluded from the metric.

Timing notes: through the axon relay `block_until_ready` is unreliable,
so stage syncs force device->host readbacks (the seal itself is the
readback here).
"""

import json
import os
import time

import numpy as np

CPU_BASELINE_PATH = os.path.join(os.path.dirname(__file__),
                                 "BENCH_CPU_BASELINE.json")


def _count_for_po2(po2: int) -> int:
    # loop guest: ~2.02 cycles/iter + ~13k fixed; target ~70% fill
    return max(1, int((0.70 * (1 << po2) - 13000) / 2.02))


def _probe_device(timeout_s: int = 90) -> bool:
    """Device-availability watchdog: the axon relay hangs jax.devices()
    when the remote endpoint is down, so probe in a subprocess with a hard
    timeout instead of hanging the driver."""
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp;"
            "print(jax.jit(lambda x: x + 1)(jnp.arange(4))[0])")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import jax

    if os.environ.get("RISC0_BENCH_CPU") == "1":  # off-chip smoke runs
        jax.config.update("jax_platforms", "cpu")
    elif not any(_probe_device() for _ in range(3)):
        print(json.dumps({
            "metric": "rv32im segment prove throughput",
            "value": 0, "unit": "cycles/s", "vs_baseline": 0.0,
            "detail": {"error": "TPU backend unreachable (axon relay down;"
                                " device probe timed out 3x)"},
        }))
        return
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    dev = str(jax.devices()[0])

    from risc0_tpu import perf
    from risc0_tpu.circuit.rv32im.prove import prove_segment
    from risc0_tpu.circuit.rv32im.verify import verify_rv32im_seal
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

    # default = the BASELINE driver metric size (po2=20, the executor's
    # default segment limit); RISC0_BENCH_PO2=16 for quick smoke runs
    po2 = int(os.environ.get("RISC0_BENCH_PO2", "20"))
    iters = int(os.environ.get("RISC0_BENCH_ITERS", "1"))

    elf = open(os.path.join(os.path.dirname(__file__),
                            "guests", "loop.bin"), "rb").read()
    env = ExecutorEnv(segment_po2=max(po2, 16)).write_slice(
        _count_for_po2(po2).to_bytes(4, "little"))
    session = ExecutorImpl(env, elf).run()  # also warms the emulator lib
    seg = session.segments[0]

    # emulator MHz on a warm >=10M-cycle run (a tiny guest would measure
    # process warm-up, not the interpreter — BENCH_r02 regression)
    mhz_env = ExecutorEnv(segment_po2=20).write_slice(
        int(10_000_000 / 2.02).to_bytes(4, "little"))
    t0 = time.perf_counter()
    mhz_session = ExecutorImpl(mhz_env, elf).run()
    texec = time.perf_counter() - t0
    exec_mhz = round(mhz_session.user_cycles / texec / 1e6, 1)

    rng = np.random.default_rng(7)
    # warm iter: pays jit compiles.  The axon remote-compile service
    # sometimes drops a response mid-body ("response body closed before
    # all bytes were read"); compiles that DID finish are in the
    # persistent cache, so a retry resumes where the failure hit.
    for attempt in range(3):
        t0 = time.perf_counter()  # per-attempt: exclude failed tries
        try:
            seal = prove_segment(seg, rng=rng)
            break
        except Exception as e:
            transient = "remote_compile" in str(e) or "INTERNAL" in str(e)
            if attempt == 2 or not transient:
                raise
            import sys
            print(f"# warm iter transient failure (retry {attempt + 1}): "
                  f"{str(e)[:120]}", file=sys.stderr, flush=True)
    warm_s = time.perf_counter() - t0

    best = warm_s
    stages = {}
    for _ in range(iters):
        perf.reset()
        t0 = time.perf_counter()
        seal = prove_segment(seg, rng=rng)
        dt = time.perf_counter() - t0
        if dt < best:
            best = dt
            stages = {k: round(v[1], 2) for k, v in perf.report().items()
                      if "." not in k and v[1] >= 0.05}

    verify_rv32im_seal(seal)

    cycles_per_s = (1 << seg.po2) / best
    vs_baseline = 1.0
    cpu = None
    if os.path.exists(CPU_BASELINE_PATH):
        with open(CPU_BASELINE_PATH) as f:
            cpu = json.load(f)
        if cpu.get("cycles_per_s"):
            # cycles/s comparison across po2 is conservative when the CPU
            # baseline was measured at a smaller po2 (CPU per-cycle
            # throughput only degrades with size; a po2=20 CPU prove is
            # ~50 h on this host and infeasible to measure directly)
            vs_baseline = round(cycles_per_s / cpu["cycles_per_s"], 2)

    print(json.dumps({
        "metric": f"rv32im segment prove throughput (po2={seg.po2}, "
                  "execute+witgen+STARK prove, seal verified)",
        "value": round(cycles_per_s),
        "unit": "cycles/s",
        "vs_baseline": vs_baseline,
        "detail": {
            "prove_s": round(best, 2),
            "stages_s": stages,
            "warm_iter_s": round(warm_s, 2),
            "execute_mhz": exec_mhz,
            "seal_words": len(seal),
            "cpu_baseline_cycles_per_s": (cpu or {}).get("cycles_per_s"),
            "device": dev,
            "device_memory": perf.device_memory(),
        },
    }))


if __name__ == "__main__":
    main()
