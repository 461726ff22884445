"""rv32im executor tests, driven by the reference's prebuilt loop guest
(risc0/zkvm/examples/loop.bin + the v1compat kernel).

Mirrors the reference's executor test strategy (host/server/exec/tests.rs):
session runs, cycle accounting, segmentation, image ids.
"""

import numpy as np
import pytest

from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

LOOP_ELF_PATH = "/root/repo/guests/loop.bin"


@pytest.fixture(scope="module")
def loop_elf():
    with open(LOOP_ELF_PATH, "rb") as f:
        return f.read()


def run_loop(loop_elf, count, po2=16, **kw):
    env = ExecutorEnv(segment_po2=po2, **kw).write_slice(
        count.to_bytes(4, "little"))
    return ExecutorImpl(env, loop_elf).run()


def test_basic_run(loop_elf):
    s = run_loop(loop_elf, 0)
    assert s.exit_code == ("Halted", 0)
    assert len(s.segments) == 1
    assert s.total_cycles == 1 << 14  # rounds up to next po2
    assert s.user_cycles > 0


def test_cycles_scale_with_count(loop_elf):
    s0 = run_loop(loop_elf, 100)
    s1 = run_loop(loop_elf, 200)
    assert s1.user_cycles > s0.user_cycles
    # ~2 cycles per loop iteration
    delta = s1.user_cycles - s0.user_cycles
    assert 150 <= delta <= 250


def test_full_po2_20_segment(loop_elf):
    # reference datasheet.rs:58: this count exactly fills one po2=20 segment
    count = 1024 * 494 + 817
    s = run_loop(loop_elf, count, po2=20)
    assert len(s.segments) == 1
    assert s.total_cycles == 1 << 20


def test_multi_segment_split(loop_elf):
    count = 1024 * 494 + 818  # one more than fits
    s = run_loop(loop_elf, count, po2=16)
    assert len(s.segments) > 2
    # chained claims: each segment's post == next segment's pre
    for a, b in zip(s.segments, s.segments[1:]):
        assert np.array_equal(a.post_digest, b.pre_digest)
    assert np.array_equal(s.segments[0].pre_digest, s.pre_state)
    # session post state root is zeroed on Halted
    # (reference host/server/exec/executor.rs:279-282)
    assert np.array_equal(s.post_state, np.zeros(8, np.uint32))
    # only the last segment terminates
    assert all(seg.terminate_state is None for seg in s.segments[:-1])
    assert s.segments[-1].terminate_state is not None
    # non-final segments claim the full po2 cycle budget via threshold
    for seg in s.segments[:-1]:
        assert seg.po2 == 16


def test_image_id_deterministic(loop_elf):
    env = ExecutorEnv()
    a = ExecutorImpl(env, loop_elf).compute_image_id()
    b = ExecutorImpl(env, loop_elf).compute_image_id()
    assert np.array_equal(a, b)
    assert a.dtype == np.uint32
    # user-facing image id is the SHA-256 SystemState digest
    # (reference binfmt/src/elf.rs:403-406), distinct from the raw root
    from risc0_tpu.zkvm.claims import SystemState
    raw = ExecutorImpl(env, loop_elf).run().pre_state
    assert np.array_equal(a, SystemState(0, raw).digest())


def test_session_limit(loop_elf):
    with pytest.raises(RuntimeError, match="limit"):
        run_loop(loop_elf, 10_000_000, po2=16, session_limit=10_000)


def test_segments_contain_touched_pages(loop_elf):
    s = run_loop(loop_elf, 100)
    seg = s.segments[0]
    assert len(seg.pages) > 0
    assert all(len(p) == 1024 for p in seg.pages.values())
    assert len(seg.page_digests) > 0
    # read_record captured the stdin word
    total_read = b"".join(seg.read_record)
    assert (100).to_bytes(4, "little") in total_read


def test_segment_standalone_replay(loop_elf):
    """Segments re-execute deterministically from their partial pre-image +
    recorded IO, reproducing claims exactly (reference execute/segment.rs:
    69-84) — the basis of distributed preflight."""
    from risc0_tpu.zkvm.exec import replay_segment

    count = 1024 * 494 + 818
    s = run_loop(loop_elf, count, po2=16)
    assert len(s.segments) > 2
    for seg in s.segments[:3] + [s.segments[-1]]:
        r = replay_segment(seg)
        assert np.array_equal(r["pre_digest"], seg.pre_digest)
        assert np.array_equal(r["post_digest"], seg.post_digest)
        assert r["user_cycles"] == seg.user_cycles
        assert r["pager_cycles"] == seg.paging_cycles
        assert r["terminate_state"] == seg.terminate_state


def test_replay_rejects_corrupted_page(loop_elf):
    from risc0_tpu.zkvm.exec import replay_segment

    s = run_loop(loop_elf, 100)
    seg = s.segments[0]
    idx = sorted(seg.pages)[0]
    page = bytearray(seg.pages[idx])
    page[100] ^= 1
    seg.pages[idx] = bytes(page)
    r = replay_segment(seg)
    # corrupted pre-image diverges from the claimed pre digest
    assert not np.array_equal(r["pre_digest"], seg.pre_digest)


def _validate_preflight(seg):
    """Strong oracles on a preflight trace (reference witgen/preflight.rs):
    exact 2^po2 rows, valid per-address txn chains with wrap-around
    prev_cycle, diff_count bookkeeping, user-cycle accounting."""
    from collections import defaultdict

    from risc0_tpu.zkvm.exec import preflight_segment

    pf = preflight_segment(seg)
    c, t = pf["cycles"], pf["txns"]
    assert len(c) == 1 << seg.po2
    by_addr = defaultdict(list)
    for addr, cyc, word, prevc, prevw in t:
        by_addr[addr].append((cyc, prevc))
    for addr, lst in by_addr.items():
        cycles = [x[0] for x in lst]
        assert cycles == sorted(set(cycles)), addr
        # first access wraps prev_cycle to the final access of the segment
        assert lst[0][1] == cycles[-1]
        for i in range(1, len(lst)):
            assert lst[i][1] == cycles[i - 1]
    # suspend_cycle = insn count + user-mode special cycles (ecall/sha)
    n_special = int((pf["back_kind"] == 1).sum() + (pf["back_kind"] == 2).sum())
    assert int(c[:, 5].max()) + n_special == seg.user_cycles
    # each non-first txn contributes exactly one diff_count; non-terminated
    # segments add one more for the segment-threshold slack (fini)
    extra = 0 if seg.terminate_state is not None else 1
    assert int(c[:, 9].sum() + c[:, 10].sum()) == len(t) - len(by_addr) + extra
    assert (np.diff(c[:, 6].astype(np.int64)) >= 0).all()
    return pf


def test_preflight_terminated_segment(loop_elf):
    env = ExecutorEnv(segment_po2=16).write_slice((100).to_bytes(4, "little"))
    s = ExecutorImpl(env, loop_elf).run()
    pf = _validate_preflight(s.segments[0])
    assert pf["table_split_cycle"] > 0


def test_preflight_suspended_segments(loop_elf):
    env = ExecutorEnv(segment_po2=15).write_slice((5000).to_bytes(4, "little"))
    s = ExecutorImpl(env, loop_elf).run()
    assert len(s.segments) >= 3
    for seg in s.segments[:2]:
        assert seg.terminate_state is None
        _validate_preflight(seg)
    assert s.segments[-1].terminate_state is not None
    _validate_preflight(s.segments[-1])


def test_file_segment_refs(tmp_path):
    """env.segment_path streams segments to disk as FileSegmentRefs
    (reference executor.rs:144-151); resolve() restores the full segment
    and dev-mode proving works off the refs."""
    from risc0_tpu.zkvm.exec import (ExecutorEnv, ExecutorImpl,
                                     FileSegmentRef, resolve_segment)
    from risc0_tpu.zkvm.prover import DevModeProver

    elf = open(LOOP_ELF_PATH, "rb").read()
    env = ExecutorEnv(segment_po2=16, segment_path=str(tmp_path)) \
        .write_slice((10).to_bytes(4, "little"))
    session = ExecutorImpl(env, elf).run()
    assert all(isinstance(s, FileSegmentRef) for s in session.segments)
    seg = resolve_segment(session.segments[0])
    assert seg.index == session.segments[0].index
    assert seg.po2 == session.segments[0].po2
    assert (tmp_path / "0.seg").exists()
    # in-memory run produces identical claims
    env2 = ExecutorEnv(segment_po2=16).write_slice(
        (10).to_bytes(4, "little"))
    session2 = ExecutorImpl(env2, elf).run()
    import numpy as np
    assert np.array_equal(seg.pre_digest, session2.segments[0].pre_digest)
    assert np.array_equal(seg.post_digest, session2.segments[0].post_digest)
    # proving path resolves refs transparently
    import os
    os.environ["RISC0_DEV_MODE"] = "1"
    try:
        info = DevModeProver().prove_session(session)
        assert info.receipt.inner.kind == "fake"
    finally:
        del os.environ["RISC0_DEV_MODE"]


def test_dump_for_replay_on_error(tmp_path, monkeypatch):
    """RISC0_DUMP_PATH captures the failing run's inputs (reference
    execute/executor.rs:389-425)."""
    import pickle

    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

    dump = tmp_path / "dump.bin"
    monkeypatch.setenv("RISC0_DUMP_PATH", str(dump))
    elf = open(LOOP_ELF_PATH, "rb").read()
    env = ExecutorEnv(segment_po2=12)  # below the executor minimum
    with pytest.raises(Exception):
        ExecutorImpl(env, elf).run()
    blob = pickle.loads(dump.read_bytes())
    assert blob["user_elf"] == elf
    assert blob["segment_po2"] == 12
