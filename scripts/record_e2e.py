"""Run the gated cryptographic e2e suite and RECORD the results.

Each test is run in its own pytest process (fresh jit caches, isolated
failures), timed, and appended to E2E_RESULTS.md with the command, device,
runtime, and outcome — the committed evidence that the full succinct /
union / identity / groth16 chains pass (VERDICT r2 item 3; reference
equivalent: the compress matrix in
risc0/zkvm/src/host/server/prove/tests.rs:574+).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/record_e2e.py [--tpu] [--only PATTERN]
"""

from __future__ import annotations

import argparse
import datetime
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "E2E_RESULTS.md")

TESTS = [
    ("rv32im segment prove+verify",
     "tests/test_rv32im_circuit.py::test_prove_verify_real_segment"),
    ("keccak circuit prove+verify",
     "tests/test_keccak_circuit.py::test_prove_verify_keccak"),
    ("recursion zkr prove -> succinct receipt",
     "tests/test_recursion_circuit.py::test_recursion_prove_verify_succinct_receipt"),
    ("official keccak_lift accepts our keccak seal",
     "tests/test_recursion_circuit.py::test_official_keccak_lift_accepts_our_seal"),
    ("rv32im lift -> verified succinct receipt",
     "tests/test_predicates.py::test_lift_prove_verify_succinct_receipt"),
    ("union(two succinct) -> verified union receipt",
     "tests/test_predicates.py::test_union_prove_verify"),
    ("keccak assumption -> union -> resolve e2e",
     "tests/test_predicates.py::test_keccak_union_e2e"),
    ("identity_p254 wrap chain",
     "tests/test_predicates.py::test_identity_p254_wrap_chain"),
    ("bigint2 guest segment prove+verify",
     "tests/test_bigint.py::test_bigint2_guest_segment_proves_and_verifies"),
    ("default_prover composite e2e",
     "tests/test_prover_impl.py::test_default_prover_real_composite_e2e"),
    ("stark_verify R1CS over fib p254 seal",
     "tests/test_groth16_prove.py::test_stark_verify_circuit_fib_p254"),
    ("sharded rv32im segment prove (8-dev mesh, identical seal)",
     "tests/test_sharded.py::test_sharded_rv32im_segment_prove_identical_seal"),
    ("PoVW log-builder guest segment prove+verify",
     "tests/test_povw_guest.py::test_log_builder_segment_proves_and_verifies"),
    ("PoVW cryptographic chain (work receipt -> prove_update -> proven journal)",
     "tests/test_povw_guest.py::test_povw_full_cryptographic_chain"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real TPU chip (RISC0_TPU_TEST_TPU=1); "
                         "mesh-dependent tests stay on the CPU 8-dev mesh")
    ap.add_argument("--only", default=None)
    ap.add_argument("--timeout", type=int, default=7200)
    a = ap.parse_args()

    base_env = dict(os.environ, RISC0_TPU_SLOW_TESTS="1",
                    PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")

    new_file = not os.path.exists(RESULTS)
    with open(RESULTS, "a") as f:
        if new_file:
            f.write("# E2E_RESULTS — recorded gated cryptographic e2e runs\n\n"
                    "Produced by `scripts/record_e2e.py` (re-run to append; "
                    "each row is one pytest process).\n\n"
                    "| date (UTC) | test | device | runtime | result |\n"
                    "|---|---|---|---|---|\n")

    for label, test in TESTS:
        if a.only and a.only not in test:
            continue
        needs_mesh = "sharded" in test or "groth16" in test
        on_tpu = a.tpu and not needs_mesh
        device = "TPU v5e (axon)" if on_tpu else "jax-cpu (8-dev mesh)"
        env = dict(base_env)
        if on_tpu:
            env["RISC0_TPU_TEST_TPU"] = "1"
        date = datetime.datetime.utcnow().strftime("%Y-%m-%d %H:%M")
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-m", "pytest", test, "-x", "-q",
                 "--no-header"],
                cwd=REPO, env=env, capture_output=True, text=True,
                timeout=a.timeout)
            dt = time.time() - t0
            if r.returncode == 0:
                outcome = "PASS"
            elif "no tests ran" in r.stdout or "SKIPPED" in r.stdout:
                outcome = "SKIP"
            else:
                outcome = "FAIL"
            tail = (r.stdout.strip().splitlines() or [""])[-1]
        except subprocess.TimeoutExpired:
            dt = time.time() - t0
            outcome, tail = "TIMEOUT", ""
        row = (f"| {date} | {label} | {device} | {dt/60:.1f} min "
               f"| {outcome} |\n")
        with open(RESULTS, "a") as f:
            f.write(row)
        print(f"{outcome:8s} {dt/60:6.1f} min  {label}  ({tail[:80]})",
              flush=True)


if __name__ == "__main__":
    main()
