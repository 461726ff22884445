"""Prover servers: options, dev-mode prover, local prover skeleton.

Mirrors the reference ProverServer layer (risc0/zkvm/src/host/server/prove/
{mod,prover_impl,dev_mode}.rs).  Round 1 implements the full session->receipt
flow with the DevModeProver (FakeReceipts + simulated latencies, the
scheduler-testing backend); the cryptographic rv32im SegmentProver plugs into
the same interface when the circuit port lands.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np

from .exec import ExecutorEnv, ExecutorImpl, Session, resolve_segment
from .receipt import (CompositeReceipt, FakeReceipt, Groth16Receipt,
                      InnerReceipt, Receipt, SegmentReceipt,
                      VerifierContext, is_dev_mode, segment_claim,
                      session_claim)
from .claims import ExitCode, MaybePruned, Output


@dataclass
class ProverOpts:
    """reference host/server/prove/opts.rs:28-59"""

    hashfn: str = "poseidon2"
    receipt_kind: str = "composite"  # composite | succinct | groth16
    max_segment_po2: int = 22
    dev_mode: bool = field(default_factory=is_dev_mode)
    # Groth16 prover for shrink_wrap.  Default (None): the in-process
    # prover (groth16/wrap.py, stark_verify R1CS + cached dev-ceremony
    # CRS) — unless RISC0_SNARK_PROVER names an external shell command
    # with the reference contract (circom stark_verify witness JSON on
    # stdin; 256-byte seal, {"seal": hex}, or snarkjs proof JSON on
    # stdout — the docker/rapidsnark flow of groth16/src/prove/docker.rs).
    # "builtin" forces the in-process prover; a callable acts like the
    # shell hook.
    snark_prover: object | None = None
    # threads for the builtin Groth16 MSMs/CRS (0 = all cores)
    snark_threads: int = 0


@dataclass
class DevModeDelay:
    """Simulated latencies for scheduler testing
    (reference prove/dev_mode.rs:41-101)."""

    execute: float = 0.0
    segment_preflight: float = 0.0
    prove_segment_core: float = 0.0
    lift: float = 0.0
    join: float = 0.0
    resolve: float = 0.0
    union: float = 0.0


@dataclass
class ProveInfo:
    receipt: Receipt
    session: Session
    # PoVW work record when the env carried a povw_job_id (reference
    # prover_impl.rs work claims; host-side accounting here)
    work: object | None = None


class ProverServer:
    """Interface (reference prove/mod.rs:54-256)."""

    def prove(self, env: ExecutorEnv, elf: bytes) -> ProveInfo:
        session = ExecutorImpl(env, elf).run()
        return self.prove_session(session)

    def prove_session(self, session: Session) -> ProveInfo:
        raise NotImplementedError

    def prove_segment(self, seg, claim) -> SegmentReceipt:
        raise NotImplementedError

    def segment_preflight(self, seg):
        """CPU half of segment proving (reference ProverServer::
        segment_preflight, host/server/prove/mod.rs:79-82): returns an
        opaque preflight result for prove_segment_core, so a scheduler
        can assign the two halves to different worker pools."""
        raise NotImplementedError

    def prove_segment_core(self, preflight, seg, claim) -> SegmentReceipt:
        """Device half over a segment_preflight result (reference
        ProverServer::prove_segment_core, prove/mod.rs:83-86)."""
        raise NotImplementedError

    def lift(self, segment_receipt):
        raise NotImplementedError

    def join(self, a, b):
        raise NotImplementedError

    def resolve(self, conditional, assumption):
        raise NotImplementedError

    def union(self, a, b):
        raise NotImplementedError

    def prove_keccak(self, request: dict):
        """ProveKeccakRequest -> SuccinctReceipt (api.proto:63-71)."""
        raise NotImplementedError


class DevModeProver(ProverServer):
    """Produces FakeReceipts instantly (reference prove/dev_mode.rs)."""

    def __init__(self, delay: DevModeDelay | None = None):
        self.delay = delay or DevModeDelay()

    def _sleep(self, t):
        if t:
            time.sleep(t)

    def prove_session(self, session: Session) -> ProveInfo:
        from .receipt import session_segment_output

        claim = session_claim(session)
        receipts = []
        kind, *rest = session.exit_code
        session_exit = ExitCode(kind, rest[0] if rest else 0)
        output = session_segment_output(session)
        for i, seg in enumerate(session.segments):
            self._sleep(self.delay.prove_segment_core)
            final = i == len(session.segments) - 1
            sc = segment_claim(seg, final, session_exit,
                               output if final else None)
            receipts.append(FakeReceipt(sc))
        receipt = Receipt(InnerReceipt("fake", FakeReceipt(claim)),
                          session.journal)
        return ProveInfo(receipt=receipt, session=session,
                         work=_session_work(session))

    def prove_segment(self, seg, claim) -> FakeReceipt:
        self._sleep(self.delay.segment_preflight)
        self._sleep(self.delay.prove_segment_core)
        return FakeReceipt(claim)

    def segment_preflight(self, seg):
        self._sleep(self.delay.segment_preflight)
        return {"fake_preflight": getattr(seg, "index", 0)}

    def prove_segment_core(self, preflight, seg, claim) -> FakeReceipt:
        self._sleep(self.delay.prove_segment_core)
        return FakeReceipt(claim)

    def lift(self, segment_receipt):
        self._sleep(self.delay.lift)
        return FakeReceipt(segment_receipt.claim)

    def join(self, a, b):
        self._sleep(self.delay.join)
        from .claims import ReceiptClaim

        joined = ReceiptClaim(
            pre=a.claim.pre, post=b.claim.post, exit_code=b.claim.exit_code,
            input=a.claim.input, output=b.claim.output)
        return FakeReceipt(joined)

    def lift_povw(self, segment_receipt, work=None):
        """Fake WorkClaim lift: the scheduler provides the Work record the
        real predicate would derive in-circuit."""
        from .povw import WorkClaim

        self._sleep(self.delay.lift)
        return FakeReceipt(WorkClaim(segment_receipt.claim, work))

    def join_povw(self, a, b, unwrap=False):
        self._sleep(self.delay.join)
        joined = a.claim.join(b.claim)  # WorkClaim.join: chain + contiguity
        return FakeReceipt(joined.claim if unwrap else joined)

    def unwrap_povw(self, inner):
        return FakeReceipt(inner.claim.claim)

    def resolve_povw(self, conditional, assumption, unwrap=False):
        from .povw import WorkClaim

        wc = conditional.claim
        inner = self.resolve(FakeReceipt(wc.claim), assumption)
        if unwrap:
            return inner
        return FakeReceipt(WorkClaim(inner.claim, wc.work))

    def resolve(self, conditional, assumption):
        """Strip the resolved assumption from the conditional claim's output
        (mirrors reference resolve semantics on the claim level)."""
        self._sleep(self.delay.resolve)
        claim = conditional.claim
        out = claim.output.value if claim.output is not None else None
        if out is None or len(out.assumptions.value.items) == 0:
            return conditional
        from .claims import Assumptions, Output, ReceiptClaim

        rest = Assumptions(list(out.assumptions.value.items[1:]))
        new_out = Output(out.journal, MaybePruned.of(rest))
        return FakeReceipt(ReceiptClaim(
            pre=claim.pre, post=claim.post, exit_code=claim.exit_code,
            input=claim.input, output=MaybePruned.of(new_out)))

    def union(self, a, b):
        """Fake union: bind both claim digests into a UnionClaim, sorted
        like the real prover (reference mmr.rs Ord on digests)."""
        self._sleep(self.delay.union)
        import numpy as np

        from .claims import UnionClaim

        da = np.asarray(a.claim.digest(), np.uint32)
        db = np.asarray(b.claim.digest(), np.uint32)
        if tuple(int(w) for w in db) < tuple(int(w) for w in da):
            da, db = db, da
        return FakeReceipt(UnionClaim(left=da, right=db))

    def compress(self, receipt):
        """Fake receipts are already minimal (reference dev_mode.rs)."""
        return receipt

    def identity_p254(self, receipt):
        return receipt

    def shrink_wrap(self, receipt):
        return receipt

    def prove_keccak(self, request: dict):
        import numpy as np

        digest = request["claim_digest"]
        digest = np.frombuffer(bytes(digest), np.uint32) \
            if isinstance(digest, (bytes, bytearray)) \
            else np.asarray(digest, np.uint32)
        return FakeReceipt(MaybePruned.from_digest(digest))


class ProverImpl(ProverServer):
    """Cryptographic local prover (reference prove/prover_impl.rs:52-181):
    proves every segment with the rv32im STARK prover, chains the claims into
    a CompositeReceipt, and self-verifies before returning."""

    def __init__(self, opts: ProverOpts | None = None):
        self.opts = opts or ProverOpts()

    def prove_session(self, session: Session) -> ProveInfo:
        from ..circuit.rv32im.prove import prove_segment as rv_prove_segment
        from .receipt import session_segment_output

        kind, *rest = session.exit_code
        session_exit = ExitCode(kind, rest[0] if rest else 0)
        # final segment claims the guest-committed output (ALL assumptions,
        # reference prover_impl.rs:98-114); resolve strips them in compress
        output = session_segment_output(session)
        receipts = []
        for i, seg in enumerate(session.segments):
            final = i == len(session.segments) - 1
            sc = segment_claim(seg, final, session_exit, output)
            seal = rv_prove_segment(resolve_segment(seg))
            receipts.append(SegmentReceipt(
                seal=seal, index=i, hashfn=self.opts.hashfn, claim=sc))
        assumption_receipts = self._assumption_receipts(session)
        composite = CompositeReceipt(
            segments=receipts, assumption_receipts=assumption_receipts)
        work = _session_work(session)
        if self.opts.receipt_kind == "composite":
            receipt = Receipt(InnerReceipt("composite", composite),
                              session.journal)
        elif self.opts.receipt_kind == "succinct":
            if getattr(session, "povw_job_id", None) is not None:
                # in-circuit PoVW: lift_povw/join_povw thread the nonces
                # through WorkClaims; the final unwrap yields the session
                # claim and the proven total Work (prover_impl povw flow)
                from .recursion_driver import compress_composite_povw
                succinct, work = compress_composite_povw(composite)
            else:
                succinct = self.compress_composite(composite)
            receipt = Receipt(InnerReceipt("succinct", succinct),
                              session.journal)
        elif self.opts.receipt_kind == "groth16":
            succinct = self.compress_composite(composite)
            wrapped = self.shrink_wrap(succinct)
            if not isinstance(wrapped, Groth16Receipt):
                raise NotImplementedError(
                    "shrink_wrap did not produce a Groth16Receipt "
                    "(external SNARK prover returned the wrap input?)")
            receipt = Receipt(InnerReceipt("groth16", wrapped),
                              session.journal)
        else:
            raise NotImplementedError(
                f"unknown receipt kind {self.opts.receipt_kind}")
        # Self-check before returning (reference prover_impl.rs:155-170).
        ctx = self._verifier_ctx()
        receipt.verify_integrity(ctx)
        return ProveInfo(receipt=receipt, session=session, work=work)

    def _assumption_receipts(self, session) -> list:
        """One receipt per assumptions_used entry, in head-first order
        (reference prover_impl.rs:121-153): Proven entries keep their
        receipt; Unresolved entries (sys_verify_integrity2, receipt=None)
        are resolved by the keccak union-root receipt when their claim
        matches, else rejected."""
        import numpy as np

        from . import recursion_driver

        union_root = recursion_driver.keccak_union_root(
            getattr(session, "pending_keccaks", []))
        out = []
        for a, r in session.assumptions_used:
            if r is None:
                root_claim = None if union_root is None else \
                    recursion_driver.receipt_claim_digest(union_root)
                if root_claim is None or not np.array_equal(
                        np.asarray(a.claim, np.uint32), root_claim):
                    raise ValueError(
                        "no receipt available for unresolved assumption: "
                        f"claim {bytes(np.asarray(a.claim, np.uint32)).hex()}")
                r = union_root
            if hasattr(r, "verify_integrity"):
                out.append(r)
        return out

    def _verifier_ctx(self) -> VerifierContext:
        from ..circuit.recursion.predicates import own_control_ids
        try:
            _ids, root = own_control_ids()
        except FileNotFoundError:
            root = None
        return VerifierContext(hashfn=self.opts.hashfn, dev_mode=False,
                               control_root=root)

    def compress_composite(self, composite):
        """CompositeReceipt -> SuccinctReceipt via lift + join tree
        (reference prover_impl.rs:183-213)."""
        from .recursion_driver import compress_composite
        return compress_composite(composite)

    def compress(self, receipt: Receipt) -> Receipt:
        """reference prove/mod.rs compress: composite -> succinct."""
        if receipt.inner.kind == "succinct":
            return receipt
        assert receipt.inner.kind == "composite"
        succinct = self.compress_composite(receipt.inner.value)
        out = Receipt(InnerReceipt("succinct", succinct), receipt.journal)
        out.verify_integrity(self._verifier_ctx())
        return out

    def prove_segment(self, seg, claim) -> SegmentReceipt:
        return self.prove_segment_core(self.segment_preflight(seg), seg,
                                       claim)

    def segment_preflight(self, seg):
        import os

        seg = resolve_segment(seg)
        if os.environ.get("RISC0_TPU_DEVICE_EXEC") == "1":
            # witness generation on the chip (exec_device.py) — the
            # "preflight" half is just the C++ re-emulation; the witness
            # is born on device and handed to prove_segment_core
            from ..circuit.rv32im.exec_device import witgen_exec_device

            return witgen_exec_device(seg)
        from ..circuit.rv32im.prove import segment_preflight as rv_preflight

        return rv_preflight(seg)

    def prove_segment_core(self, preflight, seg, claim) -> SegmentReceipt:
        from ..circuit.rv32im.prove import prove_segment_core as rv_core

        seal = rv_core(preflight)
        return SegmentReceipt(seal=seal, index=getattr(seg, "index", 0),
                              hashfn=self.opts.hashfn, claim=claim)

    def lift(self, segment_receipt):
        from . import recursion_driver
        return recursion_driver.lift(segment_receipt)

    def join(self, a, b):
        from . import recursion_driver
        return recursion_driver.join(a, b)

    def lift_povw(self, segment_receipt, work=None):
        # `work` is accepted for interface parity with DevModeProver; the
        # real predicate derives it in-circuit from the seal globals
        from . import recursion_driver
        return recursion_driver.lift_povw(segment_receipt)

    def join_povw(self, a, b, unwrap=False):
        from . import recursion_driver
        return recursion_driver.join_povw(a, b, unwrap=unwrap)

    def unwrap_povw(self, inner):
        from . import recursion_driver
        return recursion_driver.unwrap_povw(inner)

    def resolve_povw(self, conditional, assumption, unwrap=False):
        from . import recursion_driver
        return recursion_driver.resolve_povw(conditional, assumption,
                                             unwrap=unwrap)

    def resolve(self, conditional, assumption):
        from . import recursion_driver
        return recursion_driver.resolve(conditional, assumption)

    def union(self, a, b):
        from . import recursion_driver
        return recursion_driver.union(a, b)

    def prove_keccak(self, request: dict):
        from . import recursion_driver
        return recursion_driver.prove_keccak_request(request)

    def identity_p254(self, receipt):
        """SuccinctReceipt (poseidon2) -> poseidon254 wrap input
        (reference recursion/prove/mod.rs identity_p254)."""
        from . import recursion_driver
        return recursion_driver.identity_p254(receipt)

    def shrink_wrap(self, receipt):
        """SuccinctReceipt -> Groth16Receipt (reference prove/mod.rs
        shrink_wrap + the r0vm ShrinkWrap task): re-prove under the
        poseidon254 suite via the identity predicate, then Groth16-prove
        the stark_verify circuit over the resulting seal.  Default is the
        in-process prover (groth16/wrap.py; CRS generated on first use
        and cached); an external prover (ProverOpts.snark_prover, or
        RISC0_SNARK_PROVER naming a command with the reference's
        witness-JSON-in / proof-out contract) targets the reference
        circom circuit + ceremony key instead.  Either way the result is
        self-verified with the BN254 pairing verifier."""
        from ..groth16.seal_to_json import to_json

        p254 = self.identity_p254(receipt)

        def witness_json():
            return to_json(np.asarray(p254.seal, np.uint32))

        hook = self.opts.snark_prover
        if hook is None or hook == "builtin":
            cmd = None if hook == "builtin" else \
                os.environ.get("RISC0_SNARK_PROVER")
            if not cmd:
                # builtin in-process Groth16 prover (stark_verify R1CS +
                # dev-ceremony CRS, groth16/wrap.py); receipts carry the
                # generated verifying key via verifier_parameters
                from ..groth16 import wrap as g16wrap

                g, params = g16wrap.wrap(p254, n_threads=self.opts.snark_threads)
                ctx = self._verifier_ctx()
                ctx.groth16_params = params
                g.verify_integrity(ctx)  # self-check
                return g
            import subprocess

            r = subprocess.run(cmd, shell=True,
                               input=witness_json().encode(),
                               capture_output=True)
            if r.returncode != 0:
                raise RuntimeError("snark prover failed: "
                                   f"{r.stderr[-500:]!r}")
            import json as _json
            out = _json.loads(r.stdout)
        else:
            out = hook(witness_json())
        if isinstance(out, (bytes, bytearray)):
            seal = bytes(out)
        elif "seal" in out:
            seal = bytes.fromhex(out["seal"])
        else:
            from ..groth16.verifier import proof_json_to_seal
            seal = proof_json_to_seal(out.get("proof", out))

        from .receipt import (Groth16Receipt,
                              Groth16ReceiptVerifierParameters)
        params = Groth16ReceiptVerifierParameters.default()
        g = Groth16Receipt(seal=seal, claim=p254.claim,
                           verifier_parameters=params.digest())
        g.verify_integrity(self._verifier_ctx())  # self-check
        return g


def _session_work(session):
    if getattr(session, "povw_job_id", None) is None:
        return None
    from .povw import session_work

    return session_work(session, session.povw_job_id)


def get_prover_server(opts: ProverOpts | None = None) -> ProverServer:
    """reference prove/mod.rs:417-424"""
    opts = opts or ProverOpts()
    if opts.dev_mode:
        return DevModeProver()
    return ProverImpl(opts)


def default_prover() -> ProverServer:
    return get_prover_server()
