"""Guest authoring (zkvm/guest.py) + host syscalls it unlocks: hand-built
rv32im ELFs running under the vendored v1compat kernel — journal commit,
sys_fork copy-on-write children (reference host/server/exec/syscall/
fork.rs), and child journal-write rejection."""

import numpy as np
import pytest

from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl
from risc0_tpu.zkvm.guest import Asm, output_digest

NR = "risc0_zkvm_platform::syscall::nr::"


def _tok(a, short):
    return a.put_data((NR + short).encode() + b"\0")


def test_journal_guest():
    journal = b"hello-guest!"
    a = Asm()
    write_tok = _tok(a, "SYS_WRITE")
    jdata = a.put_data(journal)
    odig = a.put_data(output_digest(journal))
    a.syscall("SYS_WRITE", write_tok, 0, 0, args=[3, jdata, len(journal)])
    a.halt(user_exit=0, out_digest_token=odig)

    sess = ExecutorImpl(ExecutorEnv(segment_po2=16), a.link()).run()
    assert bytes(sess.journal) == journal
    assert sess.exit_code == ("Halted", 0)


def test_exit_code_guest():
    a = Asm()
    a.halt(user_exit=5)
    sess = ExecutorImpl(ExecutorEnv(segment_po2=16), a.link()).run()
    assert sess.exit_code == ("Halted", 5)


def _fork_guest(child_writes_journal=False):
    journal = b"parent-after-fork"
    a = Asm()
    fork_tok = _tok(a, "SYS_FORK")
    exit_tok = _tok(a, "SYS_EXIT")
    log_tok = _tok(a, "SYS_LOG")
    write_tok = _tok(a, "SYS_WRITE")
    msg = a.put_data(b"child-was-here")
    jdata = a.put_data(journal)
    odig = a.put_data(output_digest(journal))

    a.syscall("SYS_FORK", fork_tok)
    a.beq("a0", "zero", "child")
    a.syscall("SYS_WRITE", write_tok, 0, 0, args=[3, jdata, len(journal)])
    a.halt(user_exit=0, out_digest_token=odig)
    a.label("child")
    if child_writes_journal:
        a.syscall("SYS_WRITE", write_tok, 0, 0, args=[3, msg, 14])
    a.syscall("SYS_LOG", log_tok, 0, 0, args=[msg, 14])
    a.syscall("SYS_EXIT", exit_tok)
    a.halt(user_exit=7)
    return a.link(), journal


def test_sys_fork_child_runs_and_parent_commits():
    elf, journal = _fork_guest()
    sess = ExecutorImpl(ExecutorEnv(segment_po2=16), elf).run()
    assert bytes(sess.journal) == journal
    assert sess.exit_code == ("Halted", 0)


def test_sys_fork_child_journal_write_rejected():
    elf, _ = _fork_guest(child_writes_journal=True)
    with pytest.raises(RuntimeError, match="journal write"):
        ExecutorImpl(ExecutorEnv(segment_po2=16), elf).run()


def test_guest_image_id_deterministic():
    a = Asm()
    a.halt(user_exit=0)
    elf = a.link()
    i1 = ExecutorImpl(ExecutorEnv(), elf).compute_image_id()
    i2 = ExecutorImpl(ExecutorEnv(), elf).compute_image_id()
    assert np.array_equal(i1, i2)


def test_guest_segments_provable_claim():
    """The hand-built guest's session claim decodes with the standard
    machinery (executes through the same paging/claim path as reference
    prebuilts)."""
    journal = b"claim-check"
    a = Asm()
    write_tok = _tok(a, "SYS_WRITE")
    jdata = a.put_data(journal)
    odig = a.put_data(output_digest(journal))
    a.syscall("SYS_WRITE", write_tok, 0, 0, args=[3, jdata, len(journal)])
    a.halt(user_exit=0, out_digest_token=odig)
    elf = a.link()

    impl = ExecutorImpl(ExecutorEnv(segment_po2=16), elf)
    sess = impl.run()
    from risc0_tpu.zkvm.receipt import session_claim

    claim = session_claim(sess)
    # pre state must equal the image id (what Receipt.verify checks)
    assert np.array_equal(claim.pre.digest(), impl.compute_image_id())


def test_sys_pause_resume():
    """sys_pause splits the session; a second run() resumes after the
    pause ecall (reference guest env::pause + executor resume)."""
    journal = b"after-resume"
    a = Asm()
    write_tok = _tok(a, "SYS_WRITE")
    jdata = a.put_data(journal)
    odig = a.put_data(output_digest(journal))
    a.halt(user_exit=0, kind=1)  # PAUSE
    # resumed here
    a.syscall("SYS_WRITE", write_tok, 0, 0, args=[3, jdata, len(journal)])
    a.halt(user_exit=0, out_digest_token=odig)
    elf = a.link()

    impl = ExecutorImpl(ExecutorEnv(segment_po2=16), elf)
    s1 = impl.run()
    assert s1.exit_code == ("Paused", 0)
    assert bytes(s1.journal) == b""
    s2 = impl.run()
    assert s2.exit_code == ("Halted", 0)
    assert bytes(s2.journal) == journal
    # pre state of the resumed session == post state of the paused one
    assert np.array_equal(s2.pre_state, s1.post_state)
