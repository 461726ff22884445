"""Work-log update prover (zkvm/povw_updater.py) vs the reference
WorkLogUpdateProver semantics (povw/src/prover.rs + guest.rs)."""

import numpy as np
import pytest

from risc0_tpu.zkvm.claims import (ExitCode, MaybePruned, ReceiptClaim,
                                   SystemState)
from risc0_tpu.zkvm.povw import PovwJobId, Work, WorkClaim, WorkError
from risc0_tpu.zkvm.povw_updater import (LogBuilderJournal, WorkLogUpdate,
                                         WorkLogUpdateProver, apply_update)

LOG = 0xC0FFEE


def _claim():
    rng = np.random.default_rng(11)
    d = lambda: rng.integers(0, 2**32, 8, dtype=np.uint32)  # noqa: E731
    return ReceiptClaim(
        pre=MaybePruned.from_digest(d()),
        post=MaybePruned.from_digest(d()),
        exit_code=ExitCode("Halted", 0),
        input=MaybePruned.from_digest(np.zeros(8, np.uint32)),
        output=MaybePruned.from_digest(d()))


class _WorkReceipt:
    """Minimal stand-in for a SuccinctReceipt[WorkClaim]; verifies only
    under a dev-mode context (like the framework's FakeReceipt)."""

    def __init__(self, job_number, segments, value, log=LOG,
                 start_segment=0):
        jid = PovwJobId(log=log, job=job_number)
        self.claim = WorkClaim(
            _claim(),
            Work(jid.nonce(start_segment), jid.nonce(segments - 1), value))

    def verify_integrity(self, ctx):
        from risc0_tpu.zkvm.receipt import VerificationError
        if not ctx.dev_mode:
            raise VerificationError("stand-in receipt: dev mode only")


def _dev_prover(**kw):
    from risc0_tpu.zkvm.receipt import VerifierContext
    return WorkLogUpdateProver(
        log_id=kw.pop("log_id", LOG),
        verifier_ctx=VerifierContext(dev_mode=True), **kw)


def test_prove_update_chains_commitments():
    prover = _dev_prover()
    empty_root = prover.work_log.commit()

    journal, receipt = prover.prove_update(
        [_WorkReceipt(1, 30, 30 << 16), _WorkReceipt(2, 4, 4 << 16)])
    assert journal.work_log_id == LOG
    assert journal.initial_commit == empty_root
    assert journal.updated_commit == prover.work_log.commit()
    assert journal.update_value == (30 << 16) + (4 << 16)
    # dev-mode journal receipt verifies against the builder image id
    from risc0_tpu.zkvm.receipt import VerifierContext
    receipt.verify(prover.image_id, VerifierContext(dev_mode=True))
    assert LogBuilderJournal.decode(receipt.journal).updated_commit == \
        journal.updated_commit

    # continuation: second round starts from the first round's commit
    j2, _ = prover.prove_update([_WorkReceipt(3, 1, 1 << 16)])
    assert j2.initial_commit == journal.updated_commit
    assert j2.updated_commit == prover.work_log.commit()


def test_prove_update_rejects_foreign_log_and_reuse():
    prover = _dev_prover()
    with pytest.raises(WorkError):
        prover.prove_update([_WorkReceipt(1, 4, 1, log=LOG + 1)])
    prover.prove_update([_WorkReceipt(7, 4, 1)])
    with pytest.raises(Exception):  # job id already occupied
        prover.prove_update([_WorkReceipt(7, 2, 1)])


def test_prove_update_validates_before_mutating():
    """A batch with one bad claim must leave the work log untouched so a
    retry with the corrected claim succeeds (ADVICE r2: reference
    prover.rs:186-197 validates before prove_add)."""
    prover = _dev_prover()
    prover.prove_update([_WorkReceipt(1, 4, 1)])
    commit_before = prover.work_log.commit()
    jobs_before = dict(prover.work_log.jobs)
    # second claim invalid: nonce range starts at segment 2
    with pytest.raises(WorkError):
        prover.prove_update(
            [_WorkReceipt(2, 4, 1), _WorkReceipt(3, 5, 1, start_segment=2)])
    assert prover.work_log.commit() == commit_before
    assert set(prover.work_log.jobs) == set(jobs_before)
    # retrying the good claims now succeeds (job 2 was not half-inserted)
    prover.prove_update([_WorkReceipt(2, 4, 1), _WorkReceipt(3, 5, 1)])


def test_prove_update_requires_verifiable_receipts():
    """Without dev mode, an unverifiable work receipt is rejected —
    forged WorkClaims must not commit value into the journal (ADVICE r2;
    reference guest.rs env::verify_assumption per claim)."""
    from risc0_tpu.zkvm.receipt import VerifierContext

    prover = WorkLogUpdateProver(
        log_id=LOG, verifier_ctx=VerifierContext(dev_mode=False))
    with pytest.raises(WorkError):
        prover.prove_update([_WorkReceipt(1, 4, 1)])
    assert prover.work_log.is_empty()


def test_apply_update_verifies_noninclusion():
    """apply_update recomputes the post-add root through the opening —
    the in-guest transition (guest.rs WorkLogUpdate)."""
    from risc0_tpu.zkvm.povw_tree import Job, WorkLog

    log = WorkLog()
    log.add(9, Job(3))
    pre = log.commit()
    proof = log.prove_add(4, Job(19))
    jid = PovwJobId(log=LOG, job=4)
    wc = WorkClaim(_claim(), Work(jid.nonce(0), jid.nonce(19), 20 << 16))
    post, value = apply_update(pre, WorkLogUpdate(wc, proof))
    assert post == log.commit()
    assert value == 20 << 16
    # replaying the same update against the post state fails non-inclusion
    with pytest.raises(Exception):
        apply_update(post, WorkLogUpdate(wc, proof))


def test_apply_update_rejects_nonzero_start():
    from risc0_tpu.zkvm.povw_tree import Job, WorkLog

    log = WorkLog()
    proof = log.prove_job_opening(1)
    jid = PovwJobId(log=LOG, job=1)
    wc = WorkClaim(_claim(), Work(jid.nonce(2), jid.nonce(5), 4))
    with pytest.raises(WorkError):
        apply_update(log.commit(), WorkLogUpdate(wc, proof))


def test_journal_roundtrip():
    j = LogBuilderJournal(LOG, b"\1" * 32, b"\2" * 32, 12345,
                          np.arange(8, dtype=np.uint32))
    j2 = LogBuilderJournal.decode(j.encode())
    assert (j2.work_log_id, j2.initial_commit, j2.updated_commit,
            j2.update_value) == (LOG, b"\1" * 32, b"\2" * 32, 12345)
    assert np.array_equal(j2.self_image_id, j.self_image_id)
