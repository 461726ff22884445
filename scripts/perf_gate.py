"""Perf regression gate: CI-shaped measurement on the CPU backend that
completes fresh in minutes (reference analog: the datasheet/benchmark
regression harness feeding reports.risczero.com; here the gate is in-repo
and binary pass/fail).

Gated quantities:
  - fib AIR full DEEP-ALI/FRI prove+verify steady-state (the proof-system
    hot path without the rv32im witgen's 26k-op eval_check, whose CPU
    LLVM compile alone takes >40 min fresh — measured r4; the rv32im
    path is regression-covered on real hardware by bench.py instead)
  - rv32im emulator execute MHz on a 10M-cycle run (host C++ hot loop)

The committed baseline (PERF_BASELINE.json) records a known-good run; the
gate fails below `FLOOR_FRAC` of it (CI machines jitter, so the floor is
deliberately loose) and prints an update hint when the code gets faster.

    python scripts/perf_gate.py [--update]
"""

from __future__ import annotations

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "PERF_BASELINE.json")
FIB_PO2 = 12
FLOOR_FRAC = 0.5


def measure() -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from risc0_tpu.circuit import fib
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

    fib.prove(po2=FIB_PO2, seed=7)  # warm: jit compiles
    t0 = time.perf_counter()
    seal = fib.prove(po2=FIB_PO2, seed=7)
    t_prove = time.perf_counter() - t0
    fib.verify(seal)

    elf = open(os.path.join(REPO, "guests", "loop.bin"), "rb").read()
    env = ExecutorEnv(segment_po2=20).write_slice(
        int(10_000_000 / 2.02).to_bytes(4, "little"))
    ExecutorImpl(env, elf).run()  # warm the emulator lib
    t0 = time.perf_counter()
    session = ExecutorImpl(env, elf).run()
    t_exec = time.perf_counter() - t0

    return {
        "fib_po2": FIB_PO2,
        "cycles_per_s": round((1 << FIB_PO2) / t_prove),
        "execute_mhz": round(session.user_cycles / t_exec / 1e6, 1),
        "prove_s": round(t_prove, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true",
                    help="rewrite PERF_BASELINE.json from this run")
    a = ap.parse_args()

    if not a.update and not os.path.exists(BASELINE):
        # a missing baseline must be a hard failure: silently writing one
        # from the current (possibly already-regressed) run would turn the
        # CI gate into a no-op (ADVICE r3)
        print(f"FAIL: no committed baseline at {BASELINE}; run "
              "`python scripts/perf_gate.py --update` on a known-good "
              "build and commit the result")
        return 1

    got = measure()
    print("measured:", json.dumps(got))
    if a.update:
        with open(BASELINE, "w") as f:
            json.dump(got, f, indent=1)
        print(f"baseline written: {BASELINE}")
        return 0

    with open(BASELINE) as f:
        base = json.load(f)
    rc = 0
    for key, unit in (("cycles_per_s", "cycles/s"),
                      ("execute_mhz", "MHz")):
        floor = base[key] * FLOOR_FRAC
        if got[key] < floor:
            print(f"FAIL: {key} {got[key]} {unit} < floor {floor:.1f} "
                  f"({FLOOR_FRAC:.0%} of baseline {base[key]})")
            rc = 1
        else:
            print(f"PASS: {key} {got[key]} {unit} >= floor {floor:.1f}")
        if got[key] > base[key] * 1.3:
            print(f"note: {key} >30% faster than baseline — consider "
                  "`python scripts/perf_gate.py --update`")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
