"""Scheduler tests without a cluster (reference r0vm/src/actors/tests.rs
pattern: in-process workers + DevModeProver with simulated latencies)."""

import numpy as np
import pytest

from risc0_tpu.parallel.scheduler import (Factory, ProofJob, TaskKind,
                                          make_local_pools)
from risc0_tpu.zkvm.exec import ExecutorEnv
from risc0_tpu.zkvm.prover import DevModeDelay, DevModeProver

LOOP = "/root/repo/guests/loop.bin"


@pytest.fixture(scope="module")
def loop_elf():
    return open(LOOP, "rb").read()


def run_job(loop_elf, count, po2=16, delay=None, num_accel=2):
    factory = Factory()
    prover = DevModeProver(delay)
    workers = make_local_pools(factory, prover, num_cpu=1,
                               num_accel=num_accel)
    try:
        env = ExecutorEnv(segment_po2=po2).write_slice(
            count.to_bytes(4, "little"))
        job = ProofJob(factory, prover, env, loop_elf)
        return job.run()
    finally:
        for w in workers:
            w.stop()


def test_single_segment_job(loop_elf):
    session, receipt = run_job(loop_elf, 10)
    assert len(session.segments) == 1
    # final receipt claims the whole session
    assert np.array_equal(receipt.claim.pre.digest(),
                          np.asarray(receipt.claim.pre.digest()))


def test_multi_segment_join_tree(loop_elf):
    count = 1024 * 494 + 818
    session, receipt = run_job(loop_elf, count, po2=16)
    assert len(session.segments) > 2
    from risc0_tpu.zkvm.claims import SystemState

    # joined receipt must span session pre -> post
    assert np.array_equal(receipt.claim.pre.digest(),
                          SystemState(0, session.pre_state).digest())
    assert np.array_equal(receipt.claim.post.digest(),
                          SystemState(0, session.post_state).digest())
    assert receipt.claim.exit_code.kind == "Halted"


def test_join_tree_with_simulated_latency(loop_elf):
    count = 1024 * 494 + 818
    delay = DevModeDelay(prove_segment_core=0.02, lift=0.01, join=0.01)
    session, receipt = run_job(loop_elf, count, po2=16, delay=delay,
                               num_accel=4)
    assert receipt.claim.exit_code.kind == "Halted"
