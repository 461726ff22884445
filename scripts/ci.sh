#!/usr/bin/env bash
# CI harness (reference analog: .github/workflows main.yml — build, test,
# doc/example smoke, perf gate).  Everything runs on the jax CPU backend;
# the TPU bench is the driver's job, not CI's.
#
#   bash scripts/ci.sh            # full: build + tests + examples + perf gate
#   bash scripts/ci.sh --fast     # skip the perf gate
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

echo "== build native =="
make -C csrc -s

echo "== byte-compile =="
python -m compileall -q risc0_tpu scripts examples tests

echo "== unit + integration tests =="
python -m pytest tests/ -x -q

echo "== example smoke (dev-mode receipts) =="
for ex in hello_world factors sha ecdsa composition \
         password_checker prorata prover_api bonsai_remote; do
  echo "-- examples/$ex.py"
  python "examples/$ex.py" >/dev/null
done

if [[ "${1:-}" != "--fast" ]]; then
  echo "== perf regression gate =="
  python scripts/perf_gate.py
fi

echo "CI PASS"
