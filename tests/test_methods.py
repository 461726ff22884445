"""multi_test scenario guest (zkvm/methods.py) — one ELF, input-selected
behaviors, mirroring the reference's multi_test fixture
(risc0/zkvm/methods/src/multi_test.rs:25-65) and the host scenarios in
host/server/exec/tests.rs."""

import io

import numpy as np
import pytest

from risc0_tpu.zkvm import methods as M
from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

_ELF = None


def elf():
    global _ELF
    if _ELF is None:
        _ELF = M.multi_test_elf()
    return _ELF


def run(spec, *words, raw=b"", **env_kw):
    env = ExecutorEnv(segment_po2=16, **env_kw).write_slice(
        M.encode_input(spec, *words, raw=raw))
    return ExecutorImpl(env, elf()).run()


def test_busy_loop_scales_and_commits_count():
    s1 = run(M.BUSY_LOOP, 100)
    s2 = run(M.BUSY_LOOP, 5000)
    assert s1.exit_code == ("Halted", 0)
    assert s2.user_cycles - s1.user_cycles > 4000
    assert bytes(s2.journal) == (5000).to_bytes(4, "little")


def test_echo_journals_input_with_valid_output_digest():
    """ECHO journals 32 input bytes and its IN-GUEST output digest makes
    the receipt claim verify against the journal (full env::commit)."""
    payload = bytes(range(32))
    session = run(M.ECHO, raw=payload)
    assert session.exit_code == ("Halted", 0)
    assert bytes(session.journal) == payload

    # the claim chain must accept the in-guest digest: dev-mode receipt
    # verified against image id + journal (receipt_claim_ok)
    import os

    from risc0_tpu.zkvm.prover import ProverOpts, get_prover_server
    os.environ["RISC0_DEV_MODE"] = "1"
    try:
        prover = get_prover_server(ProverOpts(receipt_kind="composite",
                                              dev_mode=True))
        env = ExecutorEnv(segment_po2=16).write_slice(
            M.encode_input(M.ECHO, raw=payload))
        ex = ExecutorImpl(env, elf())
        image_id = ex.compute_image_id()
        info = prover.prove_session(ex.run())
        info.receipt.verify(image_id)
    finally:
        del os.environ["RISC0_DEV_MODE"]


def test_fault_and_out_of_bounds_raise():
    for spec in (M.FAULT, M.OUT_OF_BOUNDS):
        with pytest.raises(Exception):
            run(spec)


def test_cycle_count_journal_positive():
    session = run(M.SYS_CYCLE_COUNT)
    assert session.exit_code == ("Halted", 0)
    delta = int.from_bytes(bytes(session.journal), "little")
    assert 16 <= delta < 2000


def test_keccak_queues_coprocessor_work():
    """KECCAK_UPDATE permutes then flushes the batch: the proof request
    lands on pending_keccaks with the host-computed batch claim."""
    from risc0_tpu.circuit.keccak import compute_keccak_digest

    state0 = [0x0707070707070707] * 25
    claim = compute_keccak_digest([state0])
    root = b"\0" * 32
    session = run(M.KECCAK_UPDATE, 1, raw=claim.tobytes() + root)
    assert session.exit_code == ("Halted", 0)
    (req,) = session.pending_keccaks
    assert req["claim_digest"] == claim.tobytes()
    assert len(req["input"]) == 1


def test_verify_integrity2_registers_assumption():
    claim = bytes(range(32))
    root = bytes(range(32, 64))
    session = run(M.VERIFY_INTEGRITY2, raw=claim + root)
    assert session.exit_code == ("Halted", 0)
    (assumption, receipt), = session.assumptions_used
    assert bytes(np.asarray(assumption.claim, np.uint32).tobytes()) == claim
    assert receipt is None


def test_pause_then_resume():
    env = ExecutorEnv(segment_po2=16).write_slice(M.encode_input(M.PAUSE))
    ex = ExecutorImpl(env, elf())
    session = ex.run()
    assert session.exit_code == ("Paused", 0)
    resumed = ex.run()  # resumes after the pause ecall
    assert resumed.exit_code == ("Halted", 0)
