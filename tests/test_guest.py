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


def test_sys_pipe_roundtrip():
    """sys_pipe allocates a connected fd pair; bytes written to the write
    fd come back from the read fd (reference syscall/pipe.rs) — checked
    IN-GUEST word by word."""
    msg = b"pipe-payload-16b"  # 16 bytes, word aligned
    a = Asm()
    pipe_tok = _tok(a, "SYS_PIPE")
    write_tok = _tok(a, "SYS_WRITE")
    read_tok = _tok(a, "SYS_READ")
    fds = a.put_data(b"\0" * 8)       # (read_fd, write_fd) from host
    data = a.put_data(msg)
    back = a.put_data(b"\0" * len(msg))

    a.syscall("SYS_PIPE", pipe_tok, fds, 2)
    # write msg into the pipe's write fd
    a.li("t1", fds)
    a.lw("a4", "t1", 4)               # write_fd
    a.li("t0", 2)                     # ECALL_SOFTWARE
    a.li("t6", 16)                    # SYS_WRITE class
    a.li("a0", 0)
    a.li("a1", 0)
    a.li("a2", write_tok)
    a.li("a3", 0)
    a.add("a3", "a4", "zero")         # fd
    a.li("a4", data)
    a.li("a5", len(msg))
    a.ecall()
    # read it back from the read fd
    a.li("t1", fds)
    a.lw("t2", "t1", 0)               # read_fd
    a.li("t0", 2)
    a.li("t6", 12)                    # SYS_READ class
    a.li("a0", back)
    a.li("a1", len(msg))              # host transfer length (bytes)
    a.li("a2", read_tok)
    a.add("a3", "t2", "zero")         # fd
    a.li("a4", len(msg))
    a.ecall()
    # compare in-guest
    a.li("a5", data)
    a.li("a6", back)
    for i in range(len(msg) // 4):
        a.lw("t4", "a5", 4 * i)
        a.lw("t5", "a6", 4 * i)
        a.bne("t4", "t5", "fail")
    a.halt(0)
    a.label("fail")
    a.halt(1)

    sess = ExecutorImpl(ExecutorEnv(segment_po2=16), a.link()).run()
    assert sess.exit_code == ("Halted", 0)


def test_sys_verify_integrity_records_assumption():
    """sys_verify_integrity resolves a registered assumption receipt and
    records it on the session (reference syscall/verify.rs); an
    unregistered claim fails execution."""
    claim = np.arange(8, dtype=np.uint32)
    root = np.zeros(8, np.uint32)

    def build():
        a = Asm()
        tok = _tok(a, "SYS_VERIFY_INTEGRITY")
        buf = a.put_data(claim.tobytes() + root.tobytes())
        a.syscall("SYS_VERIFY_INTEGRITY", tok, 0, 0, args=[buf, 64])
        a.halt(0)
        return a.link()

    class _FakeAssum:
        def claim_digest(self):
            return claim

        control_root = root

    env = ExecutorEnv(segment_po2=16).add_assumption(_FakeAssum())
    sess = ExecutorImpl(env, build()).run()
    assert sess.exit_code == ("Halted", 0)
    assert len(sess.assumptions_used) == 1
    recorded, receipt = sess.assumptions_used[0]
    assert np.array_equal(recorded.claim, claim)
    assert isinstance(receipt, _FakeAssum)

    # unregistered assumption -> executor error
    with pytest.raises(RuntimeError, match="no receipt found"):
        ExecutorImpl(ExecutorEnv(segment_po2=16), build()).run()


def test_sys_keccak_permute_in_guest():
    """sys_keccak PERMUTE applies keccak-f to the guest state buffer
    (reference syscall/keccak.rs mode 0)."""
    from risc0_tpu.circuit.keccak.preflight import keccak_f

    state0 = [(i * 0x0123456789ABCDEF) % (1 << 64) for i in range(25)]
    want = keccak_f(list(state0))
    blob0 = b"".join(int(x).to_bytes(8, "little") for x in state0)
    wantb = b"".join(int(x).to_bytes(8, "little") for x in want)

    a = Asm()
    tok = _tok(a, "SYS_KECCAK")
    state = a.put_data(blob0, align=8)
    expect = a.put_data(wantb, align=8)
    a.syscall("SYS_KECCAK", tok, state, 50, args=[0, state, state])
    a.li("a5", state)
    a.li("a6", expect)
    for i in range(0, 50, 7):  # spot-check words across the state
        a.lw("t4", "a5", 4 * i)
        a.lw("t5", "a6", 4 * i)
        a.bne("t4", "t5", "fail")
    a.halt(0)
    a.label("fail")
    a.halt(1)

    sess = ExecutorImpl(ExecutorEnv(segment_po2=16), a.link()).run()
    assert sess.exit_code == ("Halted", 0)


def test_sys_verify_integrity2_records_unresolved_assumption():
    """sys_verify_integrity2 records an Unresolved assumption (receipt
    None) without requiring a host receipt (reference syscall/verify2.rs),
    and the session claim output lists it."""
    from risc0_tpu.zkvm.receipt import session_claim

    claim = np.arange(8, dtype=np.uint32) + 100
    root = np.arange(8, dtype=np.uint32) + 200

    a = Asm()
    tok = _tok(a, "SYS_VERIFY_INTEGRITY2")
    buf = a.put_data(claim.tobytes() + root.tobytes())
    a.syscall("SYS_VERIFY_INTEGRITY2", tok, 0, 0, args=[buf, 64])
    a.halt(0)

    sess = ExecutorImpl(ExecutorEnv(segment_po2=16), a.link()).run()
    assert sess.exit_code == ("Halted", 0)
    assert len(sess.assumptions_used) == 1
    recorded, receipt = sess.assumptions_used[0]
    assert receipt is None
    assert np.array_equal(recorded.claim, claim)
    assert np.array_equal(recorded.control_root, root)
    out = session_claim(sess).output.value
    assert len(out.assumptions.value.items) == 1
