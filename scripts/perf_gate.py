"""Perf regression gate: prove a real rv32im segment on the CPU backend
and fail if throughput drops below the recorded baseline floor
(reference analog: the datasheet/benchmark regression harness feeding
reports.risczero.com; here the gate is in-repo and binary pass/fail).

The committed baseline (PERF_BASELINE.json) records cycles/s from a
known-good run; the gate fails below `floor_frac` of it (CI machines
jitter, so the floor is deliberately loose) and prints an update hint
when the code gets faster.

    python scripts/perf_gate.py [--update]
"""

from __future__ import annotations

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "PERF_BASELINE.json")
PO2 = 14
FLOOR_FRAC = 0.5


def measure() -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import numpy as np

    from risc0_tpu.circuit.rv32im.prove import prove_segment
    from risc0_tpu.circuit.rv32im.verify import verify_rv32im_seal
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

    elf = open(os.path.join(REPO, "guests", "loop.bin"), "rb").read()
    count = max(1, int((0.70 * (1 << PO2) - 13000) / 2.02))
    env = ExecutorEnv(segment_po2=16).write_slice(count.to_bytes(4, "little"))
    t0 = time.perf_counter()
    session = ExecutorImpl(env, elf).run()
    t_exec = time.perf_counter() - t0

    seg = session.segments[0]
    rng = np.random.default_rng(7)
    prove_segment(seg, rng=rng)  # warm: jit compiles
    t0 = time.perf_counter()
    seal = prove_segment(seg, rng=rng)
    t_prove = time.perf_counter() - t0
    verify_rv32im_seal(seal)
    return {
        "po2": seg.po2,
        "cycles_per_s": round((1 << seg.po2) / t_prove),
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
    floor = base["cycles_per_s"] * FLOOR_FRAC
    if got["cycles_per_s"] < floor:
        print(f"FAIL: {got['cycles_per_s']} cycles/s < floor "
              f"{floor:.0f} ({FLOOR_FRAC:.0%} of baseline "
              f"{base['cycles_per_s']})")
        return 1
    if got["cycles_per_s"] > base["cycles_per_s"] * 1.3:
        print("note: >30% faster than baseline — consider "
              "`python scripts/perf_gate.py --update`")
    print(f"PASS: {got['cycles_per_s']} cycles/s >= floor {floor:.0f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
