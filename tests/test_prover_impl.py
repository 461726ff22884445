"""ProverImpl (the cryptographic local prover server): claim chaining,
composite receipt assembly, self-verification, and the full
default_prover().prove() -> Receipt.verify(image_id) flow (reference
host/server/prove/prover_impl.rs:52-181).

The default-suite test stubs the segment seal prove/verify pair (a real
rv32im prove is minutes-to-hours; the seal layer has its own gated e2e in
test_rv32im_circuit.py) — everything above the seal runs for real:
executor, claim construction, receipt chaining, digest comparisons,
journal binding."""

import os

import numpy as np
import pytest

from risc0_tpu.zkvm.claims import ExitCode
from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl
from risc0_tpu.zkvm.prover import ProverImpl, ProverOpts
from risc0_tpu.zkvm.receipt import (VerificationError, VerifierContext,
                                    segment_claim, session_claim)

LOOP = "/root/repo/guests/loop.bin"


def _stub_seal_layer(monkeypatch, session):
    """Replace the seal prove/verify pair with an index-keyed stub while
    keeping the claim logic real: prove_segment emits [index], decode_claim
    returns the exact per-segment claim the executor's session implies."""
    from risc0_tpu.circuit.rv32im import claim as claim_mod
    from risc0_tpu.circuit.rv32im import prove as prove_mod
    from risc0_tpu.circuit.rv32im import verify as verify_mod

    kind, *rest = session.exit_code
    sexit = ExitCode(kind, rest[0] if rest else 0)
    from risc0_tpu.zkvm.receipt import session_segment_output
    output = session_segment_output(session)
    claims = {}
    n = len(session.segments)
    for i, seg in enumerate(session.segments):
        claims[seg.index] = segment_claim(seg, i == n - 1, sexit, output)

    monkeypatch.setattr(prove_mod, "prove_segment",
                        lambda seg, **kw: np.array([seg.index], np.uint32))
    monkeypatch.setattr(verify_mod, "verify_rv32im_seal",
                        lambda seal: np.zeros(90, np.uint32))
    monkeypatch.setattr(claim_mod, "decode_claim",
                        lambda seal: claims[int(np.asarray(seal)[0])])
    return claims


def test_prover_impl_composite_chain(monkeypatch):
    """Multi-segment session -> composite receipt whose segment claims
    chain pre->post and whose final Receipt.verify(image_id) passes with
    dev mode OFF."""
    monkeypatch.delenv("RISC0_DEV_MODE", raising=False)
    elf = open(LOOP, "rb").read()
    count = 1024 * 33
    env = ExecutorEnv(segment_po2=15).write_slice(
        count.to_bytes(4, "little"))
    session = ExecutorImpl(env, elf).run()
    assert len(session.segments) > 1
    _stub_seal_layer(monkeypatch, session)

    prover = ProverImpl(ProverOpts(receipt_kind="composite",
                                   dev_mode=False))
    info = prover.prove_session(session)
    composite = info.receipt.inner.value
    assert len(composite.segments) == len(session.segments)
    for a, b in zip(composite.segments, composite.segments[1:]):
        assert np.array_equal(a.claim.post.digest(), b.claim.pre.digest())
        assert a.claim.exit_code.kind == "SystemSplit"
    assert composite.segments[-1].claim.exit_code.kind == "Halted"

    image_id = ExecutorImpl(env, elf).compute_image_id()
    info.receipt.verify(image_id, VerifierContext(dev_mode=False))


def test_prover_impl_rejects_claim_mismatch(monkeypatch):
    """A seal that decodes to the wrong claim must fail the self-check."""
    monkeypatch.delenv("RISC0_DEV_MODE", raising=False)
    elf = open(LOOP, "rb").read()
    env = ExecutorEnv(segment_po2=15).write_slice((5).to_bytes(4, "little"))
    session = ExecutorImpl(env, elf).run()
    claims = _stub_seal_layer(monkeypatch, session)

    # corrupt the decoded claim for segment 0
    from risc0_tpu.circuit.rv32im import claim as claim_mod
    wrong = claims[session.segments[-1].index]

    def bad_decode(seal):
        return wrong

    claim_mod.decode_claim = bad_decode
    prover = ProverImpl(ProverOpts(receipt_kind="composite",
                                   dev_mode=False))
    with pytest.raises(VerificationError):
        prover.prove_session(session)


def test_prover_impl_wrong_image_id_rejected(monkeypatch):
    monkeypatch.delenv("RISC0_DEV_MODE", raising=False)
    elf = open(LOOP, "rb").read()
    env = ExecutorEnv(segment_po2=15).write_slice((5).to_bytes(4, "little"))
    session = ExecutorImpl(env, elf).run()
    _stub_seal_layer(monkeypatch, session)
    info = ProverImpl(ProverOpts(receipt_kind="composite",
                                 dev_mode=False)).prove_session(session)
    with pytest.raises(VerificationError):
        info.receipt.verify(np.arange(8, dtype=np.uint32),
                            VerifierContext(dev_mode=False))


@pytest.mark.skipif(not os.environ.get("RISC0_TPU_SLOW_TESTS"),
                    reason="real rv32im segment prove (~2 h CPU)")
def test_default_prover_real_composite_e2e(monkeypatch):
    """VERDICT r1 item 3 'done' criterion: default_prover().prove() ->
    Receipt.verify(image_id) with RISC0_DEV_MODE unset, fully
    cryptographic (one po2=15 segment)."""
    monkeypatch.delenv("RISC0_DEV_MODE", raising=False)
    from risc0_tpu.zkvm.client import LocalProver, default_prover

    prover = default_prover()
    assert isinstance(prover, LocalProver)
    elf = open(LOOP, "rb").read()
    env = ExecutorEnv(segment_po2=15).write_slice((5).to_bytes(4, "little"))
    info = prover.prove_with_opts(
        env, elf, ProverOpts(receipt_kind="composite", dev_mode=False))
    image_id = ExecutorImpl(env, elf).compute_image_id()
    info.receipt.verify(image_id, VerifierContext(dev_mode=False))


def test_assumption_receipts_resolves_unresolved_with_union_root(
        monkeypatch):
    """_assumption_receipts (reference prover_impl.rs:121-153): Proven
    entries pass through; an Unresolved entry whose claim matches the
    keccak union root gets the union receipt; a mismatch is an error."""
    from risc0_tpu.zkvm import recursion_driver
    from risc0_tpu.zkvm.claims import Assumption

    root_claim = np.arange(8, dtype=np.uint32) + 9

    class _UnionRoot:
        def verify_integrity(self, ctx):
            pass

    union_root = _UnionRoot()
    proved = []
    monkeypatch.setattr(recursion_driver, "keccak_union_root",
                        lambda reqs: (proved.extend(reqs), union_root)[1]
                        if reqs else None)
    monkeypatch.setattr(recursion_driver, "receipt_claim_digest",
                        lambda r: root_claim)

    class _Proven:
        def verify_integrity(self, ctx):
            pass

    class _Sess:
        pending_keccaks = [{"claim_digest": bytes(root_claim)}]
        assumptions_used = [
            (Assumption(root_claim, np.zeros(8, np.uint32)), None),
            (Assumption(np.ones(8, np.uint32), np.zeros(8, np.uint32)),
             _Proven()),
        ]

    out = ProverImpl()._assumption_receipts(_Sess())
    assert out[0] is union_root
    assert isinstance(out[1], _Proven)
    assert len(proved) == 1

    # unresolved claim that the union root does NOT cover -> error
    class _Bad(_Sess):
        assumptions_used = [
            (Assumption(np.zeros(8, np.uint32), np.zeros(8, np.uint32)),
             None)]

    with pytest.raises(ValueError, match="unresolved assumption"):
        ProverImpl()._assumption_receipts(_Bad())


@pytest.mark.skipif(not os.environ.get("RISC0_TPU_SLOW_TESTS"),
                    reason="rv32im + keccak + 3 recursion proves (hours "
                           "on CPU, minutes on TPU)")
def test_prove_session_keccak_assumption_crypto_e2e(monkeypatch):
    """Full keccak-coprocessor crypto chain (reference prover_impl.rs
    keccak flow): a guest permutes one keccak state, flushes the batch
    with KECCAK_PROVE, and assumes the batch claim via
    sys_verify_integrity2; prove_session proves the rv32im segment, lifts
    it, proves the keccak circuit, lifts it with the released keccak_lift
    zkr, and resolves the assumption — the final succinct receipt passes
    Receipt.verify(image_id)."""
    monkeypatch.delenv("RISC0_DEV_MODE", raising=False)
    from risc0_tpu.circuit.keccak import compute_keccak_digest
    from risc0_tpu.zkvm.claims import (Assumption, Assumptions, MaybePruned,
                                       Output)
    from risc0_tpu.zkvm.guest import Asm

    NR = "risc0_zkvm_platform::syscall::nr::"
    state0 = [int(i * 0xDEADBEEF + 3) % (1 << 64) for i in range(25)]
    claim = compute_keccak_digest([state0])
    root = np.zeros(8, np.uint32)  # zero = same verifier context
    journal = b"keccak-e2e"
    out = Output.of(journal, Assumptions(
        [MaybePruned.of(Assumption(claim, root))]))
    odig = np.asarray(out.digest(), np.uint32).tobytes()

    a = Asm()
    ktok = a.put_data((NR + "SYS_KECCAK").encode() + b"\0")
    vtok = a.put_data((NR + "SYS_VERIFY_INTEGRITY2").encode() + b"\0")
    wtok = a.put_data((NR + "SYS_WRITE").encode() + b"\0")
    state = a.put_data(b"".join(int(x).to_bytes(8, "little")
                                for x in state0), align=8)
    cr = a.put_data(claim.tobytes())
    rootptr = a.put_data(root.tobytes())
    jdata = a.put_data(journal)
    odig_tok = a.put_data(odig)
    a.syscall("SYS_KECCAK", ktok, state, 50, args=[0, state, state])
    a.syscall("SYS_KECCAK", ktok, 0, 0, args=[1, cr, rootptr])
    a.syscall("SYS_VERIFY_INTEGRITY2", vtok, 0, 0, args=[cr, 64])
    a.syscall("SYS_WRITE", wtok, 0, 0, args=[3, jdata, len(journal)])
    a.halt(0, out_digest_token=odig_tok)
    elf = a.link()

    env = ExecutorEnv(segment_po2=15, keccak_max_po2=14)
    session = ExecutorImpl(env, elf).run()
    assert session.exit_code == ("Halted", 0)
    assert len(session.pending_keccaks) == 1
    assert session.assumptions_used[0][1] is None

    from risc0_tpu.zkvm.prover import ProverImpl
    info = ProverImpl(ProverOpts(receipt_kind="succinct",
                                 dev_mode=False)).prove_session(session)
    image_id = ExecutorImpl(env, elf).compute_image_id()
    info.receipt.verify(image_id, VerifierContext(dev_mode=False))


def _fake_p254(monkeypatch):
    """Stub identity_p254 + seal_to_json so shrink_wrap's SNARK-prover
    wiring can be tested without recursion proves."""
    from risc0_tpu.zkvm import prover as prover_mod
    from risc0_tpu.zkvm.claims import MaybePruned

    class _P254:
        seal = np.arange(16, dtype=np.uint32)
        hashfn = "poseidon254"
        claim = MaybePruned.from_digest(np.arange(8, dtype=np.uint32))

    monkeypatch.setattr(prover_mod.ProverImpl, "identity_p254",
                        lambda self, r: _P254())
    import risc0_tpu.groth16.seal_to_json as s2j
    monkeypatch.setattr(s2j, "to_json",
                        lambda seal, **kw: '{"iop": ["1", "2"]}')
    return _P254


def test_shrink_wrap_without_snark_prover_uses_builtin(monkeypatch):
    """With no external hook configured, shrink_wrap runs the in-process
    Groth16 prover (groth16/wrap.py) and self-verifies its receipt —
    the default is a working SNARK path, not a p254 passthrough."""
    from risc0_tpu.groth16 import wrap as g16wrap
    from risc0_tpu.zkvm.receipt import (Groth16Receipt,
                                        Groth16ReceiptVerifierParameters)

    p254_cls = _fake_p254(monkeypatch)
    monkeypatch.delenv("RISC0_SNARK_PROVER", raising=False)
    called = {}

    def fake_wrap(p254, n_threads=0):
        called["p254"] = p254
        g = Groth16Receipt(seal=b"\x00" * 256, claim=p254.claim,
                           verifier_parameters=np.zeros(8, np.uint32))
        return g, Groth16ReceiptVerifierParameters.default()

    monkeypatch.setattr(g16wrap, "wrap", fake_wrap)
    monkeypatch.setattr(Groth16Receipt, "verify_integrity",
                        lambda self, ctx: None)
    out = ProverImpl().shrink_wrap(object())
    assert isinstance(out, Groth16Receipt)
    assert isinstance(called["p254"], p254_cls)


def test_shrink_wrap_snark_hook_self_verifies(monkeypatch):
    """The snark_prover hook gets the circom witness JSON; a proof that
    doesn't verify against OUR claim's public inputs is rejected by the
    BN254 self-check (reference shrink_wrap verifies before returning)."""
    import json

    from risc0_tpu.zkvm.receipt import VerificationError

    _fake_p254(monkeypatch)
    got = {}

    def hook(witness_json):
        got["witness"] = witness_json
        # a REAL reference proof — valid SNARK, wrong statement for our
        # claim, so the pairing self-check must reject the wrap
        return json.load(open("/root/repo/tests/data/groth16/proof.json"))

    with pytest.raises(VerificationError, match="groth16 proof invalid"):
        ProverImpl(ProverOpts(snark_prover=hook)).shrink_wrap(object())
    assert json.loads(got["witness"]) == {"iop": ["1", "2"]}


def test_shrink_wrap_env_command_seal_path(monkeypatch):
    """RISC0_SNARK_PROVER names a shell command (witness json on stdin ->
    {"seal": hex} on stdout); a garbage seal fails the format check."""
    from risc0_tpu.zkvm.receipt import VerificationError

    _fake_p254(monkeypatch)
    seal_hex = ("00" * 32) * 8  # (0,0) points: not on curve
    monkeypatch.setenv(
        "RISC0_SNARK_PROVER",
        f"python3 -c 'import sys; sys.stdin.read(); "
        f"print(chr(123) + chr(34) + \"seal\" + chr(34) + chr(58) "
        f"+ chr(34) + \"{seal_hex}\" + chr(34) + chr(125))'")
    with pytest.raises(VerificationError, match="groth16"):
        ProverImpl(ProverOpts()).shrink_wrap(object())
