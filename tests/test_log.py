"""Structured JSON-lines logging (SURVEY §5 metrics/logging)."""

import json

import numpy as np
import pytest

from risc0_tpu import log


def test_disabled_by_default(monkeypatch):
    monkeypatch.delenv("RISC0_TPU_LOG", raising=False)
    log.reset()
    assert not log.enabled()
    log.event("noop", x=1)  # must not raise


def test_events_and_scheduler_lifecycle(tmp_path, monkeypatch):
    path = tmp_path / "log.jsonl"
    monkeypatch.setenv("RISC0_TPU_LOG", str(path))
    monkeypatch.setenv("RISC0_DEV_MODE", "1")
    log.reset()
    try:
        log.event("hello", answer=42)

        from risc0_tpu.parallel.scheduler import (Factory, ProofJob,
                                                  make_local_pools)
        from risc0_tpu.zkvm.exec import ExecutorEnv
        from risc0_tpu.zkvm.prover import DevModeProver

        factory = Factory()
        prover = DevModeProver()
        workers = make_local_pools(factory, prover, num_cpu=1, num_accel=2)
        try:
            elf = open("guests/loop.bin", "rb").read()
            env = ExecutorEnv(segment_po2=16).write_slice(
                (10).to_bytes(4, "little"))
            ProofJob(factory, prover, env, elf).run()
        finally:
            for w in workers:
                w.stop()

        from risc0_tpu import perf
        with perf.scope("logged_scope"):
            np.arange(10).sum()
        log.flush_perf(min_ms=0.0)
    finally:
        log.reset()

    records = [json.loads(line) for line in path.read_text().splitlines()]
    events = [r["event"] for r in records]
    assert "hello" in events
    kinds = {r["kind"] for r in records if r["event"] == "task_done"}
    assert {"execute", "prove_segment", "lift"} <= kinds
    assert all("ts" in r for r in records)
    assert any(r["event"] == "perf_scope" and r["scope"] == "logged_scope"
               for r in records)
