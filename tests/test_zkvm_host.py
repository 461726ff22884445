"""zkVM host-layer tests: claims, receipts, dev-mode prover.

Mirrors reference test shapes (prove_nothing per receipt kind, tagged-struct
golden vector from binfmt/src/hash.rs tests).
"""

import numpy as np
import pytest

from risc0_tpu.zkvm import claims
from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl
from risc0_tpu.zkvm.prover import DevModeDelay, DevModeProver
from risc0_tpu.zkvm.receipt import (Receipt, VerificationError,
                                    VerifierContext, session_claim)

LOOP = "/root/repo/guests/loop.bin"


def test_tagged_struct_golden():
    # reference binfmt/src/hash.rs test_tagged_struct golden vector
    d1 = claims.tagged_struct("foo", [], [1, 2013265920, 3])
    d2 = claims.tagged_struct("bar", [d1, d1], [2013265920, 5])
    d3 = claims.tagged_struct("baz", [d1, d2, d1], [6, 7, 2013265920, 9, 10])
    assert claims.digest_bytes(d3).hex() == (
        "9ff20cc6d365efa2af09181772f49013d05cdee6da896851614cae23aa5dd442")


def test_exit_code_pairs():
    for code in [claims.ExitCode("Halted", 0), claims.ExitCode("Paused", 3),
                 claims.ExitCode("SystemSplit"), claims.ExitCode("SessionLimit")]:
        pair = code.into_pair()
        assert claims.ExitCode.from_pair(*pair) == code


def test_dev_mode_prove_and_verify():
    elf = open(LOOP, "rb").read()
    env = ExecutorEnv(segment_po2=16).write_slice((50).to_bytes(4, "little"))
    prover = DevModeProver()
    info = prover.prove(env, elf)
    image_id = ExecutorImpl(env, elf).compute_image_id()
    ctx = VerifierContext(dev_mode=True)
    info.receipt.verify(image_id, ctx)


def test_fake_receipt_rejected_without_dev_mode():
    elf = open(LOOP, "rb").read()
    env = ExecutorEnv(segment_po2=16).write_slice((1).to_bytes(4, "little"))
    info = DevModeProver().prove(env, elf)
    image_id = ExecutorImpl(env, elf).compute_image_id()
    with pytest.raises(VerificationError, match="dev mode"):
        info.receipt.verify(image_id, VerifierContext(dev_mode=False))


def test_wrong_image_id_rejected():
    elf = open(LOOP, "rb").read()
    env = ExecutorEnv(segment_po2=16).write_slice((1).to_bytes(4, "little"))
    info = DevModeProver().prove(env, elf)
    bad = np.arange(8, dtype=np.uint32)
    with pytest.raises(VerificationError, match="does not match the expected claim"):
        info.receipt.verify(bad, VerifierContext(dev_mode=True))


def test_segment_claims_chain():
    elf = open(LOOP, "rb").read()
    count = 1024 * 494 + 818
    env = ExecutorEnv(segment_po2=16).write_slice(count.to_bytes(4, "little"))
    session = ExecutorImpl(env, elf).run()
    assert len(session.segments) > 2
    info = DevModeProver().prove_session(session)
    claim = session_claim(session)
    assert np.array_equal(info.receipt.claim().digest(), claim.digest())


def test_dev_mode_delay():
    import time

    elf = open(LOOP, "rb").read()
    env = ExecutorEnv(segment_po2=16).write_slice((1).to_bytes(4, "little"))
    session = ExecutorImpl(env, elf).run()
    prover = DevModeProver(DevModeDelay(prove_segment_core=0.05))
    t = time.time()
    prover.prove_session(session)
    assert time.time() - t >= 0.05 * len(session.segments)


def test_serde_roundtrip():
    from risc0_tpu.zkvm import serde

    assert serde.to_vec(7) == [7]
    assert serde.to_vec(True) == [1]
    assert serde.to_vec("abc") == [3, int.from_bytes(b"abc\0", "little")]
    words = serde.to_vec(["hi", "there"])
    assert serde.from_slice(words, [str]) == ["hi", "there"]
    words = serde.to_vec((1, "x", b"\x01\x02"))
    assert serde.from_slice(words, (int, str, bytes)) == (1, "x", b"\x01\x02")
    assert serde.from_slice(serde.to_vec(1 << 40), "u64") == 1 << 40


def test_default_prover_selection(monkeypatch):
    from risc0_tpu.zkvm import client

    monkeypatch.setenv("RISC0_DEV_MODE", "1")
    monkeypatch.setenv("RISC0_PROVER", "local")
    p = client.default_prover()
    assert isinstance(p, client.LocalProver)
    monkeypatch.setenv("RISC0_PROVER", "ipc")
    assert isinstance(client.default_prover(), client.IpcProver)
    monkeypatch.setenv("RISC0_PROVER", "bonsai")
    assert isinstance(client.default_prover(), client.ExternalProver)
    monkeypatch.setenv("RISC0_PROVER", "bogus")
    with pytest.raises(ValueError, match="Unknown prover"):
        client.default_prover()


def test_external_prover_against_api(monkeypatch):
    import tempfile
    import threading

    from risc0_tpu.zkvm.api_server import serve
    from risc0_tpu.zkvm.client import ExternalProver
    from risc0_tpu.zkvm.exec import ExecutorEnv

    srv = serve(port=0, storage=tempfile.mkdtemp())
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        prover = ExternalProver(f"http://127.0.0.1:{srv.server_address[1]}")
        elf = open(LOOP, "rb").read()
        env = ExecutorEnv().write_slice((10).to_bytes(4, "little"))
        res = prover.prove(env, elf)
        assert res["status"] == "SUCCEEDED"
        assert res["stats"]["segments"] == 1
        assert res["receipt"]
    finally:
        srv.shutdown()


def test_dev_mode_keccak_guest_receipt_verifies(monkeypatch):
    """Session::claim excludes the keccak batcher's union-root assumption
    when pending_keccaks reproduce it (reference session.rs:239-287), so
    even dev-mode receipts for keccak guests pass Receipt.verify."""
    from risc0_tpu.circuit.keccak import compute_keccak_digest
    from risc0_tpu.zkvm.claims import (Assumption, Assumptions, MaybePruned,
                                       Output)
    from risc0_tpu.zkvm.guest import Asm
    from risc0_tpu.zkvm.receipt import keccak_root_claim

    NR = "risc0_zkvm_platform::syscall::nr::"
    state0 = [int(i * 31 + 7) % (1 << 64) for i in range(25)]
    claim = compute_keccak_digest([state0])
    root = np.zeros(8, np.uint32)
    journal = b"kc-dev"
    out = Output.of(journal, Assumptions(
        [MaybePruned.of(Assumption(claim, root))]))

    a = Asm()
    ktok = a.put_data((NR + "SYS_KECCAK").encode() + b"\0")
    vtok = a.put_data((NR + "SYS_VERIFY_INTEGRITY2").encode() + b"\0")
    wtok = a.put_data((NR + "SYS_WRITE").encode() + b"\0")
    state = a.put_data(b"".join(int(x).to_bytes(8, "little")
                                for x in state0), align=8)
    cr = a.put_data(claim.tobytes())
    rootptr = a.put_data(root.tobytes())
    jdata = a.put_data(journal)
    odig = a.put_data(np.asarray(out.digest(), np.uint32).tobytes())
    a.syscall("SYS_KECCAK", ktok, state, 50, args=[0, state, state])
    a.syscall("SYS_KECCAK", ktok, 0, 0, args=[1, cr, rootptr])
    a.syscall("SYS_VERIFY_INTEGRITY2", vtok, 0, 0, args=[cr, 64])
    a.syscall("SYS_WRITE", wtok, 0, 0, args=[3, jdata, len(journal)])
    a.halt(0, out_digest_token=odig)
    elf = a.link()

    env = ExecutorEnv(segment_po2=15, keccak_max_po2=14)
    impl = ExecutorImpl(env, elf)
    session = impl.run()
    assert np.array_equal(keccak_root_claim(session.pending_keccaks), claim)

    info = DevModeProver().prove_session(session)
    # the keccak root assumption is covered by pending_keccaks -> the
    # session claim has no assumptions and full verify passes
    assert info.receipt.claim().output.value.assumptions.value.items == []
    info.receipt.verify(impl.compute_image_id(),
                        VerifierContext(dev_mode=True))
