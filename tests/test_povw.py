"""PoVW types (reference binfmt/src/povw.rs, zkvm/src/claim/work.rs,
povw/src/tree.rs): nonce encodings, contiguous Work join, WorkClaim
digests, the nonce work log, and host prove-flow threading."""

import numpy as np
import pytest

from risc0_tpu.zkvm.povw import (PovwJobId, PovwNonce, Work, WorkClaim,
                                 WorkError, WorkLog, session_work)

LOG = 0xABCDEF0123456789ABCDEF0123456789ABCDEF01


def test_nonce_u256_layout():
    n = PovwNonce(log=LOG, job=0x1122334455667788, segment=7)
    v = n.to_u256()
    assert v >> 96 == LOG
    assert (v >> 32) & ((1 << 64) - 1) == 0x1122334455667788
    assert v & 0xFFFFFFFF == 7
    assert PovwNonce.from_u256(v) == n


def test_nonce_byte_and_half_roundtrips():
    n = PovwNonce(log=LOG, job=42, segment=3)
    assert PovwNonce.from_u16s(n.to_u16s()) == n
    assert len(n.to_bytes()) == 32
    assert len(n.to_u32s()) == 8
    buf: list = []
    n.encode_to_seal(buf)
    assert len(buf) == 16 and all(v <= 0xFFFF for v in buf)
    assert PovwNonce.decode_from_seal(list(buf)) == n


def test_job_id_bytes_roundtrip():
    j = PovwJobId(log=LOG, job=99)
    assert PovwJobId.from_bytes(j.to_bytes()) == j
    assert j.nonce(5) == PovwNonce(LOG, 99, 5)


def test_work_join_contiguous():
    j = PovwJobId(log=LOG, job=1)
    a = Work(j.nonce(0), j.nonce(3), 100)
    b = Work(j.nonce(4), j.nonce(9), 50)
    ab = a.join(b)
    assert ab.value == 150
    assert ab.nonce_min == j.nonce(0) and ab.nonce_max == j.nonce(9)
    # gap -> error (matches join_povw recursion-program check)
    c = Work(j.nonce(11), j.nonce(12), 1)
    with pytest.raises(WorkError, match="not contiguous"):
        ab.join(c)
    with pytest.raises(WorkError):
        c.join(ab)


def test_work_seal_roundtrip_and_digest():
    j = PovwJobId(log=LOG, job=2)
    w = Work(j.nonce(0), j.nonce(7), 1 << 40)
    buf: list = []
    w.encode_to_seal(buf)
    assert Work.decode_from_seal(list(buf)) == w
    d1, d2 = w.digest(), w.digest()
    assert np.array_equal(d1, d2) and d1.dtype == np.uint32


def test_work_claim_digest_and_join():
    from risc0_tpu.zkvm.claims import (ExitCode, MaybePruned, ReceiptClaim,
                                       SystemState)

    j = PovwJobId(log=LOG, job=3)

    def claim(tag, exit_kind="SystemSplit"):
        st = SystemState(0, np.full(8, tag, np.uint32))
        st2 = SystemState(0, np.full(8, tag + 1, np.uint32))
        return ReceiptClaim(pre=MaybePruned.of(st), post=MaybePruned.of(st2),
                            exit_code=ExitCode(exit_kind, 0), input=None,
                            output=None)

    wc1 = WorkClaim(claim(1), Work(j.nonce(0), j.nonce(0), 10))
    wc2 = WorkClaim(claim(2, "Halted"), Work(j.nonce(1), j.nonce(1), 20))
    joined = wc1.join(wc2)
    assert joined.work.value == 30
    assert joined.claim.exit_code.kind == "Halted"
    # digest changes with work
    other = WorkClaim(claim(1), Work(j.nonce(0), j.nonce(0), 11))
    assert not np.array_equal(wc1.digest(), other.digest())
    # pruned claims join is rejected
    with pytest.raises(WorkError):
        WorkClaim(wc1.digest(), wc1.work).join(wc2)


def test_work_log_rejects_reuse():
    log = WorkLog(LOG)
    j = PovwJobId(log=LOG, job=1)
    log.record(Work(j.nonce(0), j.nonce(9), 100))
    assert log.contains(j.nonce(5)) and not log.contains(j.nonce(10))
    with pytest.raises(WorkError, match="reuse"):
        log.record(Work(j.nonce(9), j.nonce(12), 1))
    log.record(Work(j.nonce(10), j.nonce(500), 1))  # spans bitmap groups
    c1 = log.commit()
    log.record(Work(PovwJobId(log=LOG, job=2).nonce(0),
                    PovwJobId(log=LOG, job=2).nonce(0), 1))
    assert not np.array_equal(c1, log.commit())
    with pytest.raises(WorkError, match="different work log"):
        WorkLog(1).record(Work(j.nonce(501), j.nonce(501), 1))


def test_povw_threads_through_prove(monkeypatch):
    """env.povw_job_id -> Session -> ProveInfo.work covering every
    segment with value = sum of proved cycles."""
    monkeypatch.setenv("RISC0_DEV_MODE", "1")
    from risc0_tpu.zkvm.exec import ExecutorEnv
    from risc0_tpu.zkvm.prover import DevModeProver

    elf = open("guests/loop.bin", "rb").read()
    job = PovwJobId(log=LOG, job=77)
    count = 1024 * 494 + 818  # multi-segment
    env = ExecutorEnv(segment_po2=16, povw_job_id=job).write_slice(
        count.to_bytes(4, "little"))
    info = DevModeProver().prove(env, elf)
    n = len(info.session.segments)
    assert n > 1
    assert info.work.nonce_min == job.nonce(0)
    assert info.work.nonce_max == job.nonce(n - 1)
    assert info.work.value == sum(
        1 << s.po2 for s in info.session.segments)
    assert session_work(info.session, job) == info.work
