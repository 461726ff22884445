"""PoVW on-chain commitment layout (zkvm/povw_tree.py) vs the reference
tree (risc0/povw/src/tree.rs + consts.rs golden digests)."""

import pytest

from risc0_tpu.zkvm.povw_tree import (EMPTY_SUBTREE_ROOTS,
                                      FULL_SUBTREE_ROOTS, Job, Opening,
                                      TreeError, WorkLog, WorkSet,
                                      bitmap_from_range)

# reference consts.rs:22-40 / 277-283 (protocol constants)
GOLDEN = {
    ("empty", 0): "a505c1affa9b6d2ed829d837d14eb8614f198bfc7f40e3c438ac9e366f410073",
    ("empty", 1): "6603858652cd6a283a3df113a010d2b05e56d65539bd1fba68d732529eaa88da",
    ("empty", 2): "9730823a4537dd0846b3e3b464257e6b9e52acc63b957f9e0c0de58ff03c03d8",
    ("empty", 248): "99a98889a97781b0019cb47c8d71bbfb2de4a30a964fc0a81125bf060facb67c",
    ("full", 0): "db015763e201a3f7e51178938859ce0f6c6d9c3457f42b0dc9244c3ab65ebe89",
    ("full", 1): "bb025bc4bcfefdbd43a39e0507738a3efc6137465e70f4682926cb3b7d201103",
    ("full", 2): "c201d01e23807f660467e8a8f9d148ba4b855dc5d7e7485085bfaf7f53e5bec4",
    ("full", 3): "38ae93b73e70d7735b2067227f5cc747e49cc692930333140bec3ed280cae1ef",
}


def test_golden_subtree_roots():
    assert len(EMPTY_SUBTREE_ROOTS) == WorkSet.TREE_HEIGHT + 1 == 249
    for (kind, i), hexd in GOLDEN.items():
        table = EMPTY_SUBTREE_ROOTS if kind == "empty" else FULL_SUBTREE_ROOTS
        assert table[i].hex() == hexd, (kind, i)


def test_tree_heights():
    # tree.rs: Job 24, WorkLog 24+64, WorkSet 88+160
    assert Job.TREE_HEIGHT == 24
    assert WorkLog.TREE_HEIGHT == 88
    assert WorkSet.TREE_HEIGHT == 248


def test_bitmap_from_range():
    assert bitmap_from_range(0, 1) == 1
    # matches tree.rs:75-79 exactly: ((1 << max) - 1) << min
    assert bitmap_from_range(2, 5) == 0b1111100
    assert bitmap_from_range(0, 256) == (1 << 256) - 1


@pytest.mark.parametrize("index_max", [0, 1, 255, 256, 300, 1 << 16])
def test_job_openings(index_max):
    job = Job(index_max)
    commit = job.commit()
    assert commit != EMPTY_SUBTREE_ROOTS[Job.TREE_HEIGHT]
    for probe in {0, index_max, index_max + 1, index_max + 257,
                  (1 << 32) - 1}:
        op = job.prove_opening(probe)
        if job.contains(probe):
            op.verify_inclusion(commit, probe)
            with pytest.raises(TreeError):
                op.verify_noninclusion(commit, probe)
        else:
            op.verify_noninclusion(commit, probe)
            with pytest.raises(TreeError):
                op.verify_inclusion(commit, probe)


def test_job_empty_commit_is_empty_root():
    assert Job().commit() == EMPTY_SUBTREE_ROOTS[Job.TREE_HEIGHT]
    assert Job((1 << 32) - 1).commit() == FULL_SUBTREE_ROOTS[Job.TREE_HEIGHT]


def test_opening_rejects_forged_path():
    job = Job(300)
    commit = job.commit()
    op = job.prove_opening(7)
    forged = Opening(op.bitmap, [op.path[0][::-1]] + op.path[1:])
    with pytest.raises(TreeError):
        forged.verify_inclusion(commit, 7)


def test_worklog_add_and_openings():
    log = WorkLog()
    assert log.commit() == EMPTY_SUBTREE_ROOTS[WorkLog.TREE_HEIGHT]
    log.add(0, Job(499))
    log.add(5, Job(0))
    log.add(1 << 40, Job(65535))
    with pytest.raises(TreeError):
        log.add(5, Job(1))
    commit = log.commit()

    for seq, included in [(0, True), (499, True), (500, False),
                          ((5 << 32) | 0, True), ((5 << 32) | 1, False),
                          ((1 << 72) | 1234, True), (3 << 32, False)]:
        assert log.contains(seq) == included
        op = log.prove_opening(seq)
        if included:
            op.verify_inclusion(commit, seq)
        else:
            op.verify_noninclusion(commit, seq)


def test_worklog_prove_add_noninclusion():
    """prove_add returns an empty-subtree proof for the job slot against
    the PRE-add commitment (tree.rs:276-287)."""
    log = WorkLog()
    log.add(2, Job(9))
    pre = log.commit()
    proof = log.prove_add(7, Job(3))
    proof.verify_empty(pre, 7 << 32)     # any nonce index inside job 7
    post = log.commit()
    assert post != pre
    with pytest.raises(TreeError):
        proof.verify_empty(post, 7 << 32)


def test_workset_commit_and_openings():
    ws = WorkSet()
    assert ws.commit() == EMPTY_SUBTREE_ROOTS[WorkSet.TREE_HEIGHT]

    log_a = WorkLog({0: Job(99)})
    log_b = WorkLog({3: Job(0)})
    ws.add(0xABCDEF, log_a)
    ws.add((1 << 159) | 17, log_b)
    with pytest.raises(TreeError):
        ws.add(0xABCDEF, WorkLog())
    commit = ws.commit()

    used = (0xABCDEF << 96) | 42
    unused_log = (0x999999 << 96) | 42
    unused_idx = (0xABCDEF << 96) | 100
    used_b = (((1 << 159) | 17) << 96) | (3 << 32)
    for nonce, included in [(used, True), (unused_log, False),
                            (unused_idx, False), (used_b, True)]:
        assert ws.contains(nonce) == included
        op = ws.prove_opening(nonce)
        if included:
            op.verify_inclusion(commit, nonce)
        else:
            op.verify_noninclusion(commit, nonce)


def test_workset_root_changes_per_log():
    ws1 = WorkSet({1: WorkLog({0: Job(7)})})
    ws2 = WorkSet({2: WorkLog({0: Job(7)})})
    assert ws1.commit() != ws2.commit()


def test_guard_worklog_to_tree():
    """povw.WorkLog (host reuse guard) converts to the on-chain layout
    when job bitmaps are contiguous from segment 0."""
    from risc0_tpu.zkvm.povw import PovwJobId, Work, WorkError
    from risc0_tpu.zkvm.povw import WorkLog as GuardLog

    job = PovwJobId(log=77, job=3)
    guard = GuardLog(log_id=77)
    guard.record(Work(job.nonce(0), job.nonce(5), 6))
    tree = guard.to_tree()
    assert tree.jobs[3].index_max == 5
    assert tree.contains((3 << 32) | 5) and not tree.contains((3 << 32) | 6)

    guard.record(Work(job.nonce(8), job.nonce(9), 2))  # hole at 6,7
    with pytest.raises(WorkError):
        guard.to_tree()
