#!/usr/bin/env bash
# Run the RISC0_TPU_SLOW_TESTS-gated cryptographic end-to-end tests.
# Each is a full proving pipeline; CPU runtimes (4 cores) in comments —
# the same tests run on the TPU backend with RISC0_TPU_TEST_TPU=1.
#
#   bash scripts/run_slow_e2e.sh [pytest-args...]
set -x
export RISC0_TPU_SLOW_TESTS=1
cd "$(dirname "$0")/.."

python -m pytest "$@" -v \
  tests/test_rv32im_circuit.py \
  tests/test_keccak_circuit.py \
  tests/test_recursion_circuit.py::test_recursion_prove_verify_succinct_receipt \
  tests/test_recursion_circuit.py::test_official_keccak_lift_accepts_our_seal \
  tests/test_predicates.py::test_lift_prove_verify_succinct_receipt \
  tests/test_predicates.py::test_union_prove_verify \
  tests/test_predicates.py::test_keccak_union_e2e \
  tests/test_predicates.py::test_identity_p254_wrap_chain \
  tests/test_bigint.py::test_bigint2_guest_segment_proves_and_verifies \
  tests/test_prover_impl.py::test_default_prover_real_composite_e2e
# Measured (CPU, 4 cores):
#   rv32im segment prove+verify           ~20-25 min
#   keccak circuit prove+verify           ~20 min
#   official keccak_lift accepts our seal ~15 min
#   bigint guest segment prove+verify     ~56 min  (PASSED 2026-08-18)
#   recursion/lift/union/identity chains  ~1-3 h each (recursion po2=18)
