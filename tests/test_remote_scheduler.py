"""Remote-worker scheduler tests: workers pull tasks over TCP
(reference r0vm/src/actors/tests.rs boots manager + workers in one process)."""

import numpy as np
import pytest

from risc0_tpu.parallel.remote import FactoryServer, RemoteWorker
from risc0_tpu.parallel.scheduler import (Factory, ProofJob, Task, TaskKind,
                                          Worker)
from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl
from risc0_tpu.zkvm.prover import DevModeProver

LOOP = "/root/repo/guests/loop.bin"


def test_remote_workers_run_proof_dag():
    elf = open(LOOP, "rb").read()
    factory = Factory()
    server = FactoryServer(factory)
    prover = DevModeProver()

    def cpu_processor(task: Task):
        env, e = task.payload
        return ExecutorImpl(env, e).run()

    def accel_processor(task: Task):
        if task.kind == TaskKind.PROVE_SEGMENT:
            seg, claim = task.payload
            return prover.prove_segment(seg, claim)
        if task.kind == TaskKind.LIFT:
            _, sr, _work = task.payload
            return prover.lift(sr)
        if task.kind == TaskKind.JOIN:
            a, b, _povw = task.payload
            return prover.join(a.receipt, b.receipt)
        raise RuntimeError(task.kind)

    workers = [
        RemoteWorker(server.addr, [TaskKind.EXECUTE], cpu_processor,
                     "remote-cpu").start(),
        RemoteWorker(server.addr,
                     [TaskKind.PROVE_SEGMENT, TaskKind.LIFT, TaskKind.JOIN],
                     accel_processor, "remote-accel-0").start(),
        RemoteWorker(server.addr,
                     [TaskKind.PROVE_SEGMENT, TaskKind.LIFT, TaskKind.JOIN],
                     accel_processor, "remote-accel-1").start(),
    ]
    try:
        count = 1024 * 494 + 818
        env = ExecutorEnv(segment_po2=16).write_slice(
            count.to_bytes(4, "little"))
        job = ProofJob(factory, prover, env, elf)
        session, receipt = job.run()
        assert len(session.segments) > 2
        from risc0_tpu.zkvm.claims import SystemState

        assert np.array_equal(receipt.claim.pre.digest(),
                              SystemState(0, session.pre_state).digest())
        assert receipt.claim.exit_code.kind == "Halted"
    finally:
        for w in workers:
            w.stop()
        server.close()


def test_remote_worker_error_propagates():
    factory = Factory()
    server = FactoryServer(factory)

    def bad_processor(task: Task):
        raise ValueError("worker exploded")

    worker = RemoteWorker(server.addr, [TaskKind.EXECUTE], bad_processor,
                          "bad").start()
    try:
        factory.submit(Task(TaskKind.EXECUTE, job_id=1, payload=None))
        done = factory.job_channel(1).get(timeout=10)
        assert done.error is not None
        assert "exploded" in str(done.error)
    finally:
        worker.stop()
        server.close()
