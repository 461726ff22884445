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


def test_factory_affinity_dispatch():
    """Locality-aware GetTask: same-host tasks first, affinity-free tasks
    next, stealing as the fallback (SURVEY §2.11 DCN placement)."""
    from risc0_tpu.parallel.scheduler import Task

    f = Factory()
    f.submit(Task(TaskKind.LIFT, 1, "a", affinity="hostA"))
    f.submit(Task(TaskKind.LIFT, 1, "b", affinity="hostB"))
    f.submit(Task(TaskKind.LIFT, 1, "free"))

    # hostB prefers its own task over earlier-queued hostA work
    assert f.get_task([TaskKind.LIFT], host="hostB").payload == "b"
    # a foreign host takes the unplaced task before stealing hostA's
    assert f.get_task([TaskKind.LIFT], host="hostC").payload == "free"
    # nothing local left: hostC steals rather than idling
    assert f.get_task([TaskKind.LIFT], host="hostC").payload == "a"
    assert f.get_task([TaskKind.LIFT], timeout=0.01, host="hostC") is None
    # workers without a placement domain drain in FIFO order
    f.submit(Task(TaskKind.JOIN, 1, "j1", affinity="hostA"))
    f.submit(Task(TaskKind.JOIN, 1, "j2"))
    assert f.get_task([TaskKind.JOIN]).payload == "j1"
    assert f.get_task([TaskKind.JOIN]).payload == "j2"


def test_povw_job_threads_work_through_dag(loop_elf):
    """A job with a povw_job_id lifts into WorkClaims, joins with nonce
    contiguity, and unwraps at the end: the final receipt carries the
    bare session claim and job.work the summed value (reference
    job/proof.rs povw variants)."""
    from risc0_tpu.zkvm.claims import SystemState
    from risc0_tpu.zkvm.povw import PovwJobId

    factory = Factory()
    prover = DevModeProver()
    workers = make_local_pools(factory, prover, num_cpu=1, num_accel=2)
    try:
        count = 1024 * 494 + 818
        env = ExecutorEnv(
            segment_po2=16,
            povw_job_id=PovwJobId(log=0xDEADBEEF, job=42),
        ).write_slice(count.to_bytes(4, "little"))
        job = ProofJob(factory, prover, env, loop_elf)
        session, receipt = job.run()
    finally:
        for w in workers:
            w.stop()

    assert len(session.segments) > 2
    # final receipt is unwrapped: bare session-spanning ReceiptClaim
    assert np.array_equal(receipt.claim.pre.digest(),
                          SystemState(0, session.pre_state).digest())
    assert receipt.claim.exit_code.kind == "Halted"
    # proven work: contiguous nonce range over all segments, summed cycles
    assert job.work is not None
    assert job.work.nonce_min == env.povw_job_id.nonce(0)
    assert job.work.nonce_max == env.povw_job_id.nonce(
        len(session.segments) - 1)
    assert job.work.value == sum(1 << s.po2 for s in session.segments)


def test_join_tree_with_simulated_latency(loop_elf):
    count = 1024 * 494 + 818
    delay = DevModeDelay(prove_segment_core=0.02, lift=0.01, join=0.01)
    session, receipt = run_job(loop_elf, count, po2=16, delay=delay,
                               num_accel=4)
    assert receipt.claim.exit_code.kind == "Halted"


def test_union_tree_over_coproc_receipts(loop_elf):
    """Coprocessor receipts merge through UNION tasks into one union
    receipt (reference union_peak.rs MMR) alongside the main DAG."""
    from risc0_tpu.zkvm.claims import UnionClaim
    from risc0_tpu.zkvm.receipt import FakeReceipt
    from risc0_tpu.zkvm.recursion_driver import MerkleMountainAccumulator

    factory = Factory()
    prover = DevModeProver()
    workers = make_local_pools(factory, prover, num_cpu=1, num_accel=2)
    try:
        env = ExecutorEnv(segment_po2=16).write_slice(
            (10).to_bytes(4, "little"))
        coproc = [FakeReceipt(_claim_stub(i)) for i in range(5)]
        job = ProofJob(factory, prover, env, loop_elf,
                       coproc_receipts=coproc)
        _session, receipt = job.run()
        assert receipt.claim.exit_code.kind == "Halted"
        assert isinstance(job.union_receipt.claim, UnionClaim)
        # same receipts through the host-side MMR give a union too
        mmr = MerkleMountainAccumulator(merge=prover.union)
        for r in coproc:
            mmr.insert(r)
        assert isinstance(mmr.root().claim, UnionClaim)
    finally:
        for w in workers:
            w.stop()


def _claim_stub(i):
    from risc0_tpu.zkvm.claims import (ExitCode, MaybePruned, ReceiptClaim,
                                       SystemState)

    state = SystemState(0, np.full(8, i + 1, np.uint32))
    return ReceiptClaim(pre=MaybePruned.of(state), post=MaybePruned.of(state),
                        exit_code=ExitCode("Halted", 0), input=None,
                        output=None)


def test_resolve_chain_strips_assumptions(loop_elf):
    """Session assumptions feed RESOLVE tasks after the join tree
    (reference job/proof.rs resolve phase): each resolve strips the head
    assumption from the conditional claim's output."""
    from risc0_tpu.zkvm.claims import (Assumption, Assumptions, MaybePruned,
                                       Output)
    from risc0_tpu.zkvm.exec import ExecutorImpl
    from risc0_tpu.zkvm.receipt import FakeReceipt
    from risc0_tpu.parallel.scheduler import Task, Worker

    factory = Factory()
    prover = DevModeProver()
    assum_receipts = [FakeReceipt(_claim_stub(7)), FakeReceipt(_claim_stub(9))]

    def cpu_processor(task):
        env, elf = task.payload
        session = ExecutorImpl(env, elf).run()
        # simulate a guest that called env::verify twice
        session.assumptions_used = [
            (Assumption(np.asarray(r.claim.digest(), np.uint32),
                        np.zeros(8, np.uint32)), r)
            for r in assum_receipts]
        return session

    def accel_processor(task):
        if task.kind == TaskKind.PROVE_SEGMENT:
            seg, claim = task.payload
            # conditional segment claim: carries both assumptions
            assums = Assumptions([MaybePruned.of(Assumption(
                np.asarray(r.claim.digest(), np.uint32),
                np.zeros(8, np.uint32))) for r in assum_receipts])
            claim.output = MaybePruned.of(
                Output(MaybePruned.from_digest(np.zeros(8, np.uint32)),
                       MaybePruned.of(assums)))
            return prover.prove_segment(seg, claim)
        if task.kind == TaskKind.LIFT:
            return prover.lift(task.payload[1])
        if task.kind == TaskKind.JOIN:
            a, b, _povw = task.payload
            return prover.join(a.receipt, b.receipt)
        if task.kind == TaskKind.RESOLVE:
            cond, assum, _povw = task.payload
            return prover.resolve(cond, assum)
        raise RuntimeError(task.kind)

    workers = [
        Worker(factory, [TaskKind.EXECUTE], cpu_processor, "cpu").start(),
        Worker(factory, [TaskKind.PROVE_SEGMENT, TaskKind.LIFT,
                         TaskKind.JOIN, TaskKind.RESOLVE],
               accel_processor, "accel").start()]
    try:
        env = ExecutorEnv(segment_po2=16).write_slice(
            (10).to_bytes(4, "little"))
        job = ProofJob(factory, prover, env, loop_elf)
        _session, receipt = job.run()
        # both assumptions stripped: output's assumption list is empty
        out = receipt.claim.output.value
        assert len(out.assumptions.value.items) == 0
    finally:
        for w in workers:
            w.stop()


def test_pending_keccaks_feed_union_tree(loop_elf):
    """Session.pending_keccaks become PROVE_KECCAK tasks whose receipts
    union into one coprocessor receipt (reference job/proof.rs keccak
    path + union_peak.rs)."""
    from risc0_tpu.parallel.scheduler import Worker
    from risc0_tpu.zkvm.claims import UnionClaim
    from risc0_tpu.zkvm.exec import ExecutorImpl

    factory = Factory()
    prover = DevModeProver()

    def cpu_processor(task):
        env, elf = task.payload
        session = ExecutorImpl(env, elf).run()
        session.pending_keccaks = [
            {"claim_digest": np.full(8, i + 1, np.uint32).tobytes(),
             "control_root": b"\0" * 32, "po2": 14, "input": []}
            for i in range(3)]
        return session

    workers = [Worker(factory, [TaskKind.EXECUTE], cpu_processor,
                      "cpu").start()]
    accel = Worker(factory, [TaskKind.PROVE_SEGMENT, TaskKind.PROVE_KECCAK,
                             TaskKind.LIFT, TaskKind.JOIN, TaskKind.UNION,
                             TaskKind.RESOLVE],
                   lambda t: _accel(prover, t), "accel").start()
    workers.append(accel)
    try:
        env = ExecutorEnv(segment_po2=16).write_slice(
            (10).to_bytes(4, "little"))
        job = ProofJob(factory, prover, env, loop_elf)
        _session, receipt = job.run()
        assert receipt.claim.exit_code.kind == "Halted"
        assert len(job.coproc_receipts) == 3
        assert isinstance(job.union_receipt.claim, UnionClaim)
    finally:
        for w in workers:
            w.stop()


def _accel(prover, task):
    from risc0_tpu.parallel.scheduler import TaskKind as K

    if task.kind == K.PROVE_SEGMENT:
        return prover.prove_segment(*task.payload)
    if task.kind == K.PROVE_KECCAK:
        return prover.prove_keccak(task.payload)
    if task.kind == K.LIFT:
        return prover.lift(task.payload[1])
    if task.kind == K.JOIN:
        a, b = task.payload
        return prover.join(a.receipt, b.receipt)
    if task.kind == K.UNION:
        return prover.union(*task.payload)
    if task.kind == K.RESOLVE:
        return prover.resolve(*task.payload)
    raise RuntimeError(task.kind)


def test_transient_task_failures_retry(loop_elf):
    """A task that fails transiently is resubmitted up to max_retries
    (SURVEY §5 failure recovery); a persistent failure still raises."""
    from risc0_tpu.parallel.scheduler import Worker

    factory = Factory()
    prover = DevModeProver()
    fails = {"n": 0}

    def flaky(task):
        if task.kind == TaskKind.PROVE_SEGMENT:
            if fails["n"] < 1:
                fails["n"] += 1
                raise RuntimeError("transient OOM")
            return prover.prove_segment(*task.payload)
        return _accel(prover, task)

    from risc0_tpu.zkvm.exec import ExecutorImpl

    workers = [
        Worker(factory, [TaskKind.EXECUTE],
               lambda t: ExecutorImpl(*t.payload).run(), "cpu").start(),
        Worker(factory, [TaskKind.PROVE_SEGMENT, TaskKind.LIFT,
                         TaskKind.JOIN, TaskKind.UNION, TaskKind.RESOLVE],
               flaky, "accel").start()]
    try:
        env = ExecutorEnv(segment_po2=16).write_slice(
            (10).to_bytes(4, "little"))
        _s, receipt = ProofJob(factory, prover, env, loop_elf).run()
        assert receipt.claim.exit_code.kind == "Halted"
        assert fails["n"] == 1

        # persistent failure exhausts retries and raises
        def always_fail(task):
            if task.kind == TaskKind.PROVE_SEGMENT:
                raise RuntimeError("hard failure")
            return _accel(prover, task)

        workers[1].processor = always_fail
        job = ProofJob(factory, prover, env, loop_elf)
        with pytest.raises(RuntimeError, match="hard failure"):
            job.run()
    finally:
        for w in workers:
            w.stop()


def test_composite_receipt_kind_skips_recursion(loop_elf):
    """receipt_kind='composite' chains segment receipts directly
    (reference prover_impl composite flow): no LIFT/JOIN tasks run and the
    result is a CompositeReceipt whose claims chain pre->post."""
    from risc0_tpu.zkvm.receipt import CompositeReceipt

    factory = Factory()

    class NoLiftProver(DevModeProver):
        def lift(self, *a, **k):
            raise AssertionError("lift must not run in composite mode")

        join = lift_povw = lift

    prover = NoLiftProver()
    workers = make_local_pools(factory, prover, num_cpu=1, num_accel=2)
    try:
        env = ExecutorEnv(segment_po2=16).write_slice(
            (1024 * 494 + 818).to_bytes(4, "little"))
        job = ProofJob(factory, prover, env, loop_elf,
                       receipt_kind="composite")
        session, receipt = job.run()
        assert isinstance(receipt, CompositeReceipt)
        assert len(receipt.segments) == len(session.segments) > 2
        for a, b in zip(receipt.segments, receipt.segments[1:]):
            assert np.array_equal(a.claim.post.digest(),
                                  b.claim.pre.digest())
        assert receipt.claim().exit_code.kind == "Halted"
    finally:
        for w in workers:
            w.stop()


def test_groth16_receipt_kind_shrink_wraps(loop_elf):
    """receipt_kind='groth16' appends a SHRINK_WRAP task: the converged
    succinct root goes through prover.shrink_wrap (identity_p254 + the
    configured external SNARK prover)."""
    factory = Factory()

    class WrapSpy(DevModeProver):
        wrapped = []

        def shrink_wrap(self, receipt):
            self.wrapped.append(receipt)
            return ("p254", receipt)

    prover = WrapSpy()
    workers = make_local_pools(factory, prover, num_cpu=1, num_accel=2)
    try:
        env = ExecutorEnv(segment_po2=16).write_slice(
            (100_000).to_bytes(4, "little"))
        job = ProofJob(factory, prover, env, loop_elf,
                       receipt_kind="groth16")
        _session, receipt = job.run()
        assert receipt[0] == "p254"
        assert len(WrapSpy.wrapped) == 1
        assert receipt[1].claim.exit_code.kind == "Halted"
    finally:
        for w in workers:
            w.stop()


def test_keccak_guest_assumption_resolved_by_union_receipt():
    """Full keccak-coprocessor DAG (reference batcher flow): the guest
    permutes a keccak state, flushes the batch with KECCAK_PROVE, and
    assumes the batch claim via sys_verify_integrity2; the job proves the
    coprocessor request, unions it, and resolves the assumption with the
    union receipt — the final receipt's output has no assumptions left."""
    from risc0_tpu.zkvm.guest import Asm

    NR = "risc0_zkvm_platform::syscall::nr::"
    state0 = b"".join(int(i * 7 + 1).to_bytes(8, "little")
                      for i in range(25))
    claim = (np.arange(8, dtype=np.uint32) * 3 + 5)
    root = np.arange(8, dtype=np.uint32) + 400

    a = Asm()
    ktok = a.put_data((NR + "SYS_KECCAK").encode() + b"\0")
    vtok = a.put_data((NR + "SYS_VERIFY_INTEGRITY2").encode() + b"\0")
    state = a.put_data(state0, align=8)
    cr = a.put_data(claim.tobytes())   # claim ++ root contiguous (64 B)
    rootptr = a.put_data(root.tobytes())
    a.syscall("SYS_KECCAK", ktok, state, 50, args=[0, state, state])
    a.syscall("SYS_KECCAK", ktok, 0, 0, args=[1, cr, rootptr])
    a.syscall("SYS_VERIFY_INTEGRITY2", vtok, 0, 0, args=[cr, 64])
    a.halt(0)
    elf = a.link()

    factory = Factory()
    prover = DevModeProver()
    workers = make_local_pools(factory, prover, num_cpu=1, num_accel=2)
    try:
        job = ProofJob(factory, prover, ExecutorEnv(segment_po2=16), elf)
        session, receipt = job.run()
        assert len(session.pending_keccaks) == 1
        assert session.assumptions_used[0][1] is None  # unresolved
        # single batch -> the union receipt IS the coprocessor receipt
        assert np.array_equal(
            np.asarray(job.union_receipt.claim.digest(), np.uint32), claim)
        out = receipt.claim.output.value
        assert out.assumptions.value.items == []  # resolved away
        assert receipt.claim.exit_code.kind == "Halted"
    finally:
        for w in workers:
            w.stop()


def test_stream_keccak_coprocessor_overlaps_execution(loop_elf):
    """stream_keccak=True: PROVE_KECCAK tasks are submitted the moment the
    guest flushes a batch (reference CoprocessorCallback), not queued on
    the session — and the union-root resolution still strips the guest's
    assumption."""
    from risc0_tpu.zkvm.guest import Asm

    NR = "risc0_zkvm_platform::syscall::nr::"
    claim = (np.arange(8, dtype=np.uint32) * 5 + 1)
    root = np.arange(8, dtype=np.uint32) + 600

    a = Asm()
    ktok = a.put_data((NR + "SYS_KECCAK").encode() + b"\0")
    vtok = a.put_data((NR + "SYS_VERIFY_INTEGRITY2").encode() + b"\0")
    state = a.put_data(b"\x01" * 200, align=8)
    cr = a.put_data(claim.tobytes())
    rootptr = a.put_data(root.tobytes())
    a.syscall("SYS_KECCAK", ktok, state, 50, args=[0, state, state])
    a.syscall("SYS_KECCAK", ktok, 0, 0, args=[1, cr, rootptr])
    a.syscall("SYS_VERIFY_INTEGRITY2", vtok, 0, 0, args=[cr, 64])
    a.halt(0)
    elf = a.link()

    factory = Factory()
    prover = DevModeProver()
    workers = make_local_pools(factory, prover, num_cpu=1, num_accel=2)
    try:
        job = ProofJob(factory, prover, ExecutorEnv(segment_po2=16), elf,
                       stream_keccak=True)
        session, receipt = job.run()
        assert session.pending_keccaks == []      # streamed, not queued
        assert job.union_receipt is not None
        assert np.array_equal(
            np.asarray(job.union_receipt.claim.digest(), np.uint32), claim)
        out = receipt.claim.output.value
        assert out.assumptions.value.items == []  # resolved away
    finally:
        for w in workers:
            w.stop()


def test_preflight_split_pipelines_segments(loop_elf):
    """PREFLIGHT/PROVE_SEGMENT split (reference ProverServer::
    {segment_preflight, prove_segment_core}, prove/mod.rs:79-86 +
    actors/worker.rs:569-592): with one CPU and one accel worker, host
    preflight of segment N+1 overlaps device proving of segment N, so a
    multi-segment session beats the serial (unsplit) pipeline."""
    import time

    count = 1024 * 494 + 818   # >2 segments at po2=16
    delay = DevModeDelay(segment_preflight=0.12, prove_segment_core=0.15)

    def run(split):
        factory = Factory()
        prover = DevModeProver(delay)
        workers = make_local_pools(factory, prover, num_cpu=1, num_accel=1)
        try:
            env = ExecutorEnv(segment_po2=16).write_slice(
                count.to_bytes(4, "little"))
            job = ProofJob(factory, prover, env, loop_elf,
                           split_preflight=split)
            t0 = time.perf_counter()
            session, receipt = job.run()
            return time.perf_counter() - t0, session, receipt
        finally:
            for w in workers:
                w.stop()

    t_serial, s1, r1 = run(split=False)
    t_split, s2, r2 = run(split=True)
    n = len(s2.segments)
    assert n >= 3
    # same final claim either way
    assert np.array_equal(r1.claim.digest(), r2.claim.digest())
    # serial lower bound: n*(preflight+core); split lower bound:
    # preflight + n*core.  Require a real win with slack for jitter.
    assert t_split < t_serial - 0.5 * (n - 1) * 0.12, \
        f"no pipeline win: serial {t_serial:.2f}s split {t_split:.2f}s"
