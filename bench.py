"""Driver benchmark — runs on real TPU hardware (axon backend by default).

Headline (BASELINE.json): guest cycles proved/sec/chip — a REAL rv32im
segment (loop guest) is executed, witness-generated, proved with the full
DEEP-ALI/FRI pipeline, and the seal verified.  vs_baseline compares
cycles-proved/sec against the recorded CPU-backend baseline
(BENCH_CPU_BASELINE.json, measured with scripts/prove_bench.py --cpu);
the baseline's po2 is surfaced as vs_baseline_cpu_po2 in the detail.

Budget-aware + incremental (reference analog: the datasheet harness
always emits its per-po2 rows, risc0/zkvm/examples/datasheet.rs:98-143):
the parent process climbs a po2 ladder (16 -> 18 -> 20), measuring each
size in a SUBPROCESS with a hard per-size timeout, and prints one full
JSON result line to stdout (flushed) the moment each size lands.  The
driver takes the last line; a hang at a bigger size can never erase a
smaller size's recorded number, and the parent always exits 0.

Knobs: RISC0_BENCH_PO2S (default "16,18,20"), RISC0_BENCH_BUDGET_S
(default 3300), RISC0_BENCH_ITERS (default 1 timed iter after the
compile-warm iter), RISC0_BENCH_CPU=1 (off-chip smoke).

Timing notes: through the axon relay `block_until_ready` is unreliable,
so stage syncs force device->host readbacks (the seal itself is the
readback here).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CPU_BASELINE_PATH = os.path.join(REPO, "BENCH_CPU_BASELINE.json")

# Per-size wall caps for one fresh measuring subprocess (compile/trace
# caches warm; see docs/PERF.md "Cold start").  The parent clamps these
# to its remaining budget.
PO2_CAP_S = {14: 600, 16: 1200, 18: 1500, 20: 2700, 21: 3300, 22: 3900}


def _count_for_po2(po2: int) -> int:
    # loop guest: ~2.02 cycles/iter + ~13k fixed; target ~70% fill
    return max(1, int((0.70 * (1 << po2) - 13000) / 2.02))


def _probe_device(timeout_s: int = 90) -> bool:
    """Device-availability watchdog: the axon relay hangs jax.devices()
    when the remote endpoint is down, so probe in a subprocess with a hard
    timeout instead of hanging the driver."""
    code = ("import jax, jax.numpy as jnp;"
            "print(jax.jit(lambda x: x + 1)(jnp.arange(4))[0])")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _note(msg: str):
    print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr,
          flush=True)


def measure_one(po2: int) -> dict:
    """Child body: execute + prove + verify one segment at `po2`."""
    import jax

    if os.environ.get("RISC0_BENCH_CPU") == "1":  # off-chip smoke runs
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    dev = str(jax.devices()[0])

    from risc0_tpu import perf
    from risc0_tpu.circuit.rv32im.prove import prove_segment
    from risc0_tpu.circuit.rv32im.verify import verify_rv32im_seal
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

    iters = int(os.environ.get("RISC0_BENCH_ITERS", "1"))

    elf = open(os.path.join(REPO, "guests", "loop.bin"), "rb").read()
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
            _note(f"warm iter transient failure (retry {attempt + 1}): "
                  f"{str(e)[:120]}")
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
                      if ("." not in k or k.startswith("commit_group."))
                      and v[1] >= 0.05}  # commit_group.N are top-level

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

    return {
        "metric": f"rv32im segment prove throughput (po2={seg.po2}, "
                  "execute+witgen+STARK prove, seal verified)",
        "value": round(cycles_per_s),
        "unit": "cycles/s",
        "vs_baseline": vs_baseline,
        "detail": {
            "po2": seg.po2,
            "prove_s": round(best, 2),
            "stages_s": stages,
            "warm_iter_s": round(warm_s, 2),
            "execute_mhz": exec_mhz,
            "seal_words": len(seal),
            "cpu_baseline_cycles_per_s": (cpu or {}).get("cycles_per_s"),
            "vs_baseline_cpu_po2": (cpu or {}).get("po2"),
            "device": dev,
            "device_memory": perf.device_memory(),
        },
    }


def child_main(po2: int):
    fake = os.environ.get("RISC0_BENCH_FAKE")  # test-only: parent plumbing
    if fake:
        if fake == "timeout_once":
            # first attempt hangs past the cap; the retry succeeds —
            # models a cold-compile cap blow resumed from the warm cache
            marker = os.environ["RISC0_BENCH_FAKE_MARKER"]
            if not os.path.exists(marker):
                open(marker, "w").close()
                time.sleep(9999)
        time.sleep(float(os.environ.get("RISC0_BENCH_FAKE_SLEEP", "0")))
        if fake == "fail":
            raise RuntimeError("fake child failure")
        print(json.dumps({
            "metric": f"fake (po2={po2})", "value": po2, "unit": "cycles/s",
            "vs_baseline": 1.0, "detail": {"po2": po2}}), flush=True)
        return
    print(json.dumps(measure_one(po2)), flush=True)


def main():
    t_start = time.monotonic()
    budget = float(os.environ.get("RISC0_BENCH_BUDGET_S", "3300"))

    def remaining():
        return budget - (time.monotonic() - t_start)

    on_cpu = os.environ.get("RISC0_BENCH_CPU") == "1"
    if not on_cpu and not any(_probe_device() for _ in range(3)):
        print(json.dumps({
            "metric": "rv32im segment prove throughput",
            "value": 0, "unit": "cycles/s", "vs_baseline": 0.0,
            "detail": {"error": "TPU backend unreachable (axon relay down;"
                                " device probe timed out 3x)"},
        }), flush=True)
        return

    if os.environ.get("RISC0_BENCH_PO2"):  # single-size compat knob
        ladder = [int(os.environ["RISC0_BENCH_PO2"])]
    else:
        ladder = [int(p) for p in
                  os.environ.get("RISC0_BENCH_PO2S", "16,18,20").split(",")]

    emitted = 0
    timed_out = False
    for po2 in ladder:
        if timed_out:
            break
        for attempt in (1, 2):  # retry once: relay blips are transient and
            # the persistent compile cache makes the retry resume cheaply
            cap_env = float(os.environ.get("RISC0_BENCH_CAP_S", 0))
            cap = min(cap_env or PO2_CAP_S.get(po2, 3600), remaining() - 30)
            if cap < min(120, cap_env or 120):
                _note(f"budget exhausted ({remaining():.0f}s left); "
                      f"stopping before po2={po2}")
                timed_out = True
                break
            _note(f"measuring po2={po2} try {attempt} (cap {cap:.0f}s, "
                  f"{remaining():.0f}s budget left)")
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--one",
                     str(po2)],
                    timeout=cap, capture_output=True, text=True, cwd=REPO,
                    env=dict(os.environ,
                             PYTHONPATH=f"{REPO}:"
                                        f"{os.environ.get('PYTHONPATH', '')}"))
            except subprocess.TimeoutExpired as e:
                # the child may have printed its result line and then hung
                # in relay teardown — keep a completed measurement
                partial = e.stdout or ""
                if isinstance(partial, bytes):
                    partial = partial.decode(errors="replace")
                line = next((ln for ln in reversed(partial.splitlines())
                             if ln.startswith("{")), None)
                if line:
                    print(line, flush=True)
                    emitted += 1
                _note(f"po2={po2} exceeded its {cap:.0f}s cap"
                      f"{' (result line salvaged)' if line else ''}")
                if line:
                    break  # measurement landed; teardown hang only
                # A first-attempt timeout is usually COLD COMPILES, and
                # every compile that finished is in the persistent cache —
                # the retry resumes roughly where the cap hit (BENCH_r05
                # fix: the old code abandoned the whole ladder here with
                # hours of budget left).  Only give up on this size after
                # a second cap blows with the cache already warm.
                if attempt == 2:
                    timed_out = True
                    break
                continue  # attempt 2 resumes from the persistent cache
            line = next((ln for ln in reversed(r.stdout.splitlines())
                         if ln.startswith("{")), None)
            if r.returncode == 0 and line:
                print(line, flush=True)
                emitted += 1
                break
            tail = (r.stderr.strip().splitlines() or [""])[-1]
            _note(f"po2={po2} failed rc={r.returncode}: {tail[:200]}")

    if emitted == 0:
        print(json.dumps({
            "metric": "rv32im segment prove throughput",
            "value": 0, "unit": "cycles/s", "vs_baseline": 0.0,
            "detail": {"error": "no size completed within budget "
                                f"(budget_s={budget})"},
        }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        child_main(int(sys.argv[2]))
    else:
        main()
