"""Cluster config (reference r0vm/src/actors/config.rs + testdata TOMLs):
parse, validate, and launch a mixed local/remote deployment from a TOML
description."""

import numpy as np
import pytest

from risc0_tpu.parallel.config import (AppConfig, launch_cluster,
                                       load_config)
from risc0_tpu.parallel.scheduler import ProofJob, TaskKind

DEFAULT_TOML = """
version = 1

[api]
listen = "127.0.0.1:0"

[manager]
listen = "127.0.0.1:0"

[executor]
count = 1

[[prover]]
subscribe = [
  "prove-segment",
  "prove-keccak",
  "lift",
  "join",
  "union",
  "resolve",
]
"""


def test_load_default_toml():
    cfg = load_config(DEFAULT_TOML)
    assert cfg.version == 1
    assert cfg.api.listen == "127.0.0.1:0"
    assert cfg.executor.count == 1
    assert len(cfg.provers) == 1
    assert cfg.provers[0].subscribe == [
        TaskKind.PROVE_SEGMENT, TaskKind.PROVE_KECCAK, TaskKind.LIFT,
        TaskKind.JOIN, TaskKind.UNION, TaskKind.RESOLVE]


def test_bad_version_and_kind_rejected():
    with pytest.raises(ValueError, match="version"):
        load_config("version = 2\n")
    with pytest.raises(ValueError, match="unknown task kind"):
        load_config("""
version = 1
[[prover]]
subscribe = ["frobnicate"]
""")


def test_simulate_delays_parsed():
    cfg = load_config("""
version = 1
[[prover]]
subscribe = ["lift", "join"]
count = 3
[prover.simulate]
lift = 0.01
join = 0.02
""")
    assert cfg.provers[0].count == 3
    assert cfg.provers[0].simulate == {"lift": 0.01, "join": 0.02}


def test_launch_cluster_runs_a_job(monkeypatch):
    """A config-built deployment (1 executor + 2 sim provers) proves a
    session end-to-end through the ProofJob DAG."""
    monkeypatch.setenv("RISC0_DEV_MODE", "1")
    cfg = load_config("""
version = 1
[executor]
count = 1
[[prover]]
count = 2
subscribe = ["prove-segment", "lift", "join", "union", "resolve"]
[prover.simulate]
prove_segment_core = 0.005
""")
    cluster = launch_cluster(cfg)
    try:
        from risc0_tpu.zkvm.exec import ExecutorEnv
        from risc0_tpu.zkvm.prover import DevModeProver

        elf = open("guests/loop.bin", "rb").read()
        env = ExecutorEnv(segment_po2=16).write_slice(
            (1024 * 494 + 818).to_bytes(4, "little"))
        job = ProofJob(cluster.factory, DevModeProver(), env, elf)
        session, receipt = job.run()
        assert len(session.segments) > 1
        assert receipt.claim.exit_code.kind == "Halted"
    finally:
        cluster.stop()


def test_launch_cluster_with_remote_prover(monkeypatch):
    """A [[prover]] entry with a manager address connects RemoteWorkers
    over TCP to the manager's factory listener."""
    monkeypatch.setenv("RISC0_DEV_MODE", "1")
    manager_cfg = load_config("""
version = 1
[manager]
listen = "127.0.0.1:0"
[executor]
count = 1
""")
    cluster = launch_cluster(manager_cfg)
    try:
        port = cluster.factory_server.addr[1]
        worker_cfg = load_config(f"""
version = 1
[[prover]]
manager = "127.0.0.1:{port}"
subscribe = ["prove-segment", "lift", "join", "union", "resolve"]
""")
        remote = launch_cluster(worker_cfg)
        try:
            from risc0_tpu.zkvm.exec import ExecutorEnv
            from risc0_tpu.zkvm.prover import DevModeProver

            elf = open("guests/loop.bin", "rb").read()
            env = ExecutorEnv(segment_po2=16).write_slice(
                (10).to_bytes(4, "little"))
            job = ProofJob(cluster.factory, DevModeProver(), env, elf)
            _session, receipt = job.run()
            assert receipt.claim.exit_code.kind == "Halted"
        finally:
            remote.stop()
    finally:
        cluster.stop()


def test_cluster_ships_segments_by_asset_ref(monkeypatch, tmp_path):
    """With [storage].assets set, ProofJob uploads each segment to the
    cluster asset server and PROVE_SEGMENT payloads carry content-addressed
    SegmentAssetRefs that remote workers resolve (and cache) by digest."""
    monkeypatch.setenv("RISC0_DEV_MODE", "1")
    cfg = load_config(f"""
version = 1
[manager]
listen = "127.0.0.1:0"
[executor]
count = 1
[storage]
path = "{tmp_path}"
assets = "127.0.0.1:0"
""")
    cluster = launch_cluster(cfg)
    try:
        assert cluster.asset_addr is not None
        port = cluster.factory_server.addr[1]
        remote = launch_cluster(load_config(f"""
version = 1
[[prover]]
manager = "127.0.0.1:{port}"
subscribe = ["prove-segment", "lift", "join", "union", "resolve"]
"""))
        try:
            from risc0_tpu.parallel.assets import SegmentAssetRef
            from risc0_tpu.zkvm.exec import ExecutorEnv
            from risc0_tpu.zkvm.prover import DevModeProver

            shipped = []
            orig = SegmentAssetRef.resolve

            def spying_resolve(self):
                shipped.append(self)
                return orig(self)

            monkeypatch.setattr(SegmentAssetRef, "resolve", spying_resolve)

            elf = open("guests/loop.bin", "rb").read()
            env = ExecutorEnv(segment_po2=16).write_slice(
                (1024 * 494 + 818).to_bytes(4, "little"))
            job = ProofJob(cluster.factory, DevModeProver(), env, elf,
                           asset_addr=cluster.asset_addr)
            session, receipt = job.run()
            assert receipt.claim.exit_code.kind == "Halted"
            assert len(session.segments) > 1
            # every segment travelled as a ref and was resolved remotely
            assert len(shipped) == len(session.segments)
            # ...and the blobs landed in the disk-backed store
            assert len(list(tmp_path.iterdir())) == len(
                {r.ref.digest for r in shipped})
        finally:
            remote.stop()
    finally:
        cluster.stop()


def test_config_prover_worker_handles_prove_keccak(monkeypatch):
    """A config-built prover worker subscribed to prove-keccak processes
    ProveKeccakRequest tasks (dev-mode: fake receipt from the claim)."""
    monkeypatch.setenv("RISC0_DEV_MODE", "1")
    cfg = load_config("""
version = 1
[[prover]]
count = 1
subscribe = ["prove-keccak"]
[prover.simulate]
""")
    cluster = launch_cluster(cfg)
    try:
        import numpy as np

        from risc0_tpu.parallel.scheduler import Task

        claim = (np.arange(8, dtype=np.uint32) + 77).tobytes()
        chan = cluster.factory.job_channel(99)
        cluster.factory.submit(Task(TaskKind.PROVE_KECCAK, 99, {
            "claim_digest": claim, "control_root": b"\0" * 32,
            "input": [], "po2": 14}))
        done = chan.get(timeout=10)
        assert done.error is None
        assert done.result.claim.digest().tobytes() == claim
    finally:
        cluster.stop()
