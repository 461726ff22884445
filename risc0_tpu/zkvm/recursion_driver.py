"""Recursion driver: lift / join / resolve orchestration on self-authored
predicates (reference risc0/zkvm/src/host/recursion/prove/mod.rs:73-260 and
host/server/prove/prover_impl.rs compress flow).

Our predicate programs and allowed-control-ID set come from
circuit/recursion/predicates.py (scripts/gen_predicates.py regenerates).
Every helper returns a SuccinctReceipt carrying the full ReceiptClaim so
receipts can be joined further.
"""

from __future__ import annotations

import numpy as np

from .. import field as F
from ..circuit.recursion.predicates import load_own_program, own_control_ids
from ..circuit.recursion.prove import MerkleGroup, prove_zkr
from .claims import ReceiptClaim
from .receipt import SuccinctReceipt, VerificationError


def _allowed():
    ids, root = own_control_ids()
    names = sorted(ids)
    leaves = [ids[k] for k in names]
    return ids, leaves, root


def _proof_words(group: MerkleGroup, control_id) -> list[int]:
    """[index word] ++ sibling digest words for the in-VM inclusion check."""
    proof = group.get_proof(control_id)
    words = [int(proof["index"])]
    for d in proof["digests"]:
        words.extend(int(w) for w in np.asarray(d, np.uint32))
    return words


def _claim_body_words(claim: ReceiptClaim) -> list[int]:
    """input/pre/post/output digests + exit pair, the join/resolve tape
    claim layout (predicates._read_claim)."""
    from .claims import opt_digest

    sys_exit, user_exit = claim.exit_code.into_pair()
    words = []
    for d in (opt_digest(claim.input), claim.pre.digest(),
              claim.post.digest(), opt_digest(claim.output)):
        words.extend(int(w) for w in np.asarray(d, np.uint32))
    words.extend([sys_exit, user_exit])
    return words


def lift(segment_receipt) -> SuccinctReceipt:
    """rv32im SegmentReceipt -> SuccinctReceipt via lift_rv32im_{po2}
    (reference recursion/prove/mod.rs:73-103)."""
    seal = np.asarray(segment_receipt.seal, np.uint32)
    po2 = int(seal[91])  # [version][90 globals][po2]
    ids, leaves, root = _allowed()
    name = f"lift_rv32im_{po2}"
    if name not in ids:
        raise VerificationError(
            f"no lift predicate for po2={po2}; regenerate with "
            f"scripts/gen_predicates.py --po2s {po2}")
    prog = load_own_program(name)
    tape = [int(w) for w in np.asarray(root, np.uint32)]
    tape += [int(w) for w in seal]
    receipt = prove_zkr(prog, ids[name], leaves, tape,
                        claim=segment_receipt.claim)
    want = segment_receipt.claim.digest()
    got = receipt_claim_digest(receipt)
    if not np.array_equal(got, want):
        raise VerificationError("lift output claim digest mismatch")
    return receipt


def receipt_claim_digest(receipt: SuccinctReceipt) -> np.ndarray:
    """Claim digest decoded from the receipt's seal output."""
    from ..circuit.recursion.prove import read_sha_halfs

    out = F.decode_np(np.asarray(receipt.seal[:32], np.uint32))
    return read_sha_halfs(out[16:32])


def join(left: SuccinctReceipt, right: SuccinctReceipt) -> SuccinctReceipt:
    """Two chained SuccinctReceipts -> one (reference recursion/prove/
    mod.rs:168-190).  left/right must carry full ReceiptClaims."""
    ids, leaves, root = _allowed()
    group = MerkleGroup(leaves)
    prog = load_own_program("join")
    tape = [int(w) for w in np.asarray(root, np.uint32)]
    for r in (left, right):
        tape += _proof_words(group, r.control_id)
        tape += [int(w) for w in np.asarray(r.seal, np.uint32)]
        tape += _claim_body_words(r.claim)
    joined = ReceiptClaim(
        pre=left.claim.pre, post=right.claim.post,
        exit_code=right.claim.exit_code,
        input=left.claim.input, output=right.claim.output)
    receipt = prove_zkr(prog, ids["join"], leaves, tape, claim=joined)
    if not np.array_equal(receipt_claim_digest(receipt), joined.digest()):
        raise VerificationError("join output claim digest mismatch")
    return receipt


def lift_keccak(keccak_seal, po2: int) -> SuccinctReceipt:
    """Keccak coprocessor seal -> SuccinctReceipt via the released
    keccak_lift_{po2} zkr (reference host/server/prove/keccak.rs +
    recursion/prove/mod.rs prove_keccak_lift).  The receipt claim is the
    pruned keccak claim digest."""
    from ..circuit.keccak.verify import (keccak_digest_from_globals,
                                         verify_keccak_seal)
    from ..circuit.recursion.prove import load_keccak_lift, prove_zkr
    from .claims import MaybePruned

    out = verify_keccak_seal(keccak_seal)
    claim = keccak_digest_from_globals(out, montgomery=True)
    # prove against OUR allowed set (keccak_lift ids are members, see
    # scripts/gen_predicates.py --keccak) so the receipt unions/resolves
    # with rv32im receipts under one control root; the program echoes the
    # tape-head control root into its output, which the union/resolve
    # predicates require to equal the outer allowed root (reference
    # prove_keccak passes ALLOWED_CONTROL_ROOT the same way)
    ids, leaves, root = _allowed()
    tape = [int(w) for w in np.asarray(root, np.uint32)]
    tape += [int(x) for x in keccak_seal]
    for w in claim:
        tape.extend([int(w) & 0xFFFF, int(w) >> 16])
    tape.append(1 << po2)
    prog = load_keccak_lift(po2)
    receipt = prove_zkr(prog, ids[f"keccak_lift_{po2}"], leaves, tape,
                        claim=MaybePruned.from_digest(
                            np.asarray(claim, np.uint32)))
    if not np.array_equal(receipt_claim_digest(receipt),
                          np.asarray(claim, np.uint32)):
        raise VerificationError("keccak lift claim digest mismatch")
    return receipt


def prove_keccak_request(request: dict) -> SuccinctReceipt:
    """ProveKeccakRequest (api.proto:63-71 / Session.pending_keccaks
    entries: claim_digest, po2, control_root, input) -> SuccinctReceipt."""
    from ..circuit.keccak import prove_keccak

    po2 = int(request["po2"])
    seal = prove_keccak(request["input"], po2)
    receipt = lift_keccak(seal, po2)
    want = np.frombuffer(bytes(request["claim_digest"]), np.uint32) \
        if isinstance(request["claim_digest"], (bytes, bytearray)) \
        else np.asarray(request["claim_digest"], np.uint32)
    if not np.array_equal(receipt_claim_digest(receipt), want):
        raise VerificationError(
            "keccak claim digest mismatch vs guest request")
    return receipt


def resolve(conditional: SuccinctReceipt,
            assumption: SuccinctReceipt) -> SuccinctReceipt:
    """Remove the head assumption from a conditional receipt's claim
    (reference host/recursion/prove/mod.rs:214-258).  The conditional's
    claim must carry an unpruned Output whose head assumption is
    `assumption`'s claim with the zero ("self") control root."""
    from .claims import (Assumptions, MaybePruned, Output, ReceiptClaim,
                         opt_digest)

    claim = conditional.claim
    out = claim.output.value if hasattr(claim.output, "value") \
        else claim.output
    if out is None or not out.assumptions.value.items:
        raise VerificationError("conditional receipt has no assumptions")
    items = out.assumptions.value.items
    head = items[0]
    head_claim = head.value.claim if hasattr(head, "value") else head.claim
    head_claim = np.asarray(
        head_claim if isinstance(head_claim, np.ndarray)
        else head_claim.digest(), np.uint32)
    rest_digest = Assumptions(list(items[1:])).digest()
    journal = np.asarray(out.journal if isinstance(out.journal, np.ndarray)
                         else out.journal.digest(), np.uint32)

    ids, leaves, root = _allowed()
    group = MerkleGroup(leaves)
    prog = load_own_program("resolve")
    sys_exit, user_exit = claim.exit_code.into_pair()
    tape = [int(w) for w in np.asarray(root, np.uint32)]
    tape += _proof_words(group, conditional.control_id)
    tape += [int(w) for w in np.asarray(conditional.seal, np.uint32)]
    for d in (opt_digest(claim.input), claim.pre.digest(),
              claim.post.digest()):
        tape += [int(w) for w in np.asarray(d, np.uint32)]
    tape += [sys_exit, user_exit]
    for d in (journal, head_claim, rest_digest):
        tape += [int(w) for w in np.asarray(d, np.uint32)]
    tape += _proof_words(group, assumption.control_id)
    tape += [int(w) for w in np.asarray(assumption.seal, np.uint32)]

    resolved = ReceiptClaim(
        pre=claim.pre, post=claim.post, exit_code=claim.exit_code,
        input=claim.input,
        output=MaybePruned.of(Output(
            MaybePruned.from_digest(journal),
            MaybePruned.from_digest(rest_digest))))
    receipt = prove_zkr(prog, ids["resolve"], leaves, tape, claim=resolved)
    if not np.array_equal(receipt_claim_digest(receipt), resolved.digest()):
        raise VerificationError("resolve output claim digest mismatch")
    return receipt


def identity_p254(inner: SuccinctReceipt) -> SuccinctReceipt:
    """SuccinctReceipt (poseidon2) -> SuccinctReceipt (poseidon254): the
    stark-to-snark wrap input (reference host/recursion/prove/mod.rs:355-392).

    The identity predicate verifies the inner recursion seal in-VM against
    our poseidon2 allowed root; the outer proof is generated under the
    poseidon254 suite with the singleton BN254 identity control ID as its
    allowed set (control_id.rs BN254_IDENTITY_CONTROL_ID equivalent)."""
    from ..circuit.recursion.predicates import identity_p254_control_id
    from ..hash.suite import POSEIDON254

    if inner.hashfn != "poseidon2":
        raise VerificationError("identity_p254 requires a poseidon2 inner")
    ids, leaves, root = _allowed()
    group = MerkleGroup(leaves)
    prog = load_own_program("identity")
    tape = [int(w) for w in np.asarray(root, np.uint32)]
    tape += _proof_words(group, inner.control_id)
    tape += [int(w) for w in np.asarray(inner.seal, np.uint32)]
    p254_id = identity_p254_control_id()
    receipt = prove_zkr(prog, p254_id, [p254_id], tape,
                        claim=inner.claim, suite=POSEIDON254)
    if not np.array_equal(receipt_claim_digest(receipt),
                          inner.claim.digest()):
        raise VerificationError("identity_p254 output claim digest mismatch")
    return receipt


def _assumption_digest(receipt: SuccinctReceipt) -> np.ndarray:
    """Assumption{claim, control_root=receipt's allowed root}.digest()
    (reference receipt/succinct.rs to_assumption(false))."""
    from .claims import Assumption

    return Assumption(np.asarray(receipt.claim.digest(), np.uint32),
                      np.asarray(receipt.control_root, np.uint32)).digest()


def union(a: SuccinctReceipt, b: SuccinctReceipt) -> SuccinctReceipt:
    """Two SuccinctReceipts -> one SuccinctReceipt[UnionClaim] (reference
    host/recursion/prove/mod.rs:185-213).  Operands are sorted so the
    lesser assumption digest (big-endian) is on the left."""
    from .claims import UnionClaim

    da, db = _assumption_digest(a), _assumption_digest(b)
    # order matches the reference's Digest Ord: lexicographic on u32 words
    if tuple(int(w) for w in da) <= tuple(int(w) for w in db):
        left, right, dl, dr = a, b, da, db
    else:
        left, right, dl, dr = b, a, db, da

    ids, leaves, root = _allowed()
    group = MerkleGroup(leaves)
    prog = load_own_program("union")
    tape = [int(w) for w in np.asarray(root, np.uint32)]
    for r in (left, right):
        tape += _proof_words(group, r.control_id)
        tape += [int(w) for w in np.asarray(r.seal, np.uint32)]
    claim = UnionClaim(left=dl, right=dr)
    receipt = prove_zkr(prog, ids["union"], leaves, tape, claim=claim)
    if not np.array_equal(receipt_claim_digest(receipt), claim.digest()):
        raise VerificationError("union output claim digest mismatch")
    return receipt


class MerkleMountainAccumulator:
    """Accumulate receipts into a single union receipt with a log-depth
    merge tree (reference zkvm/src/mmr.rs:22-95).  `merge` defaults to
    the union prover; inject a cheap merge for dev-mode tests."""

    def __init__(self, merge=None):
        self.merge = merge or union
        self.peaks: list = []  # list of (height, item), back = smallest

    def insert(self, item):
        height = 0
        while self.peaks and self.peaks[-1][0] == height:
            _, other = self.peaks.pop()
            item = self.merge(item, other)
            height += 1
        self.peaks.append((height, item))

    def root(self):
        if not self.peaks:
            raise ValueError("no elements in MMR")
        items = [it for _h, it in self.peaks]
        acc = items[0]
        for nxt in items[1:]:
            acc = self.merge(acc, nxt)
        return acc


# ---------------------------------------------------------------------------
# PoVW variants: WorkClaim-wrapped receipts threading nonces in-circuit
# (reference recursion/prove/mod.rs:88-173, 255-352)
# ---------------------------------------------------------------------------

def _work_tape_words(work) -> list[int]:
    """nonce_min/nonce_max as 8 raw u32 words each + value as 2 raw words
    (predicates._read_work layout)."""
    words = [int(w) for w in work.nonce_min.to_u32s()]
    words += [int(w) for w in work.nonce_max.to_u32s()]
    words += [int(w) for w in np.frombuffer(
        int(work.value).to_bytes(8, "little"), np.uint32)]
    return words


def lift_povw(segment_receipt) -> SuccinctReceipt:
    """rv32im SegmentReceipt -> SuccinctReceipt[WorkClaim] via
    lift_rv32im_povw_{po2} (reference recursion/prove/mod.rs:88-103).  The
    receipt claim is WorkClaim{segment claim, Work{nonce, nonce, cycles}}
    with the nonce read from the seal's povw_nonce globals in-VM."""
    from ..circuit.rv32im.claim import decode_work
    from .povw import WorkClaim

    seal = np.asarray(segment_receipt.seal, np.uint32)
    po2 = int(seal[91])
    ids, leaves, root = _allowed()
    name = f"lift_rv32im_povw_{po2}"
    if name not in ids:
        raise VerificationError(
            f"no PoVW lift predicate for po2={po2}; regenerate with "
            f"scripts/gen_predicates.py --povw-po2s {po2}")
    prog = load_own_program(name)
    tape = [int(w) for w in np.asarray(root, np.uint32)]
    tape += [int(w) for w in seal]
    wc = WorkClaim(segment_receipt.claim, decode_work(seal))
    receipt = prove_zkr(prog, ids[name], leaves, tape, claim=wc)
    if not np.array_equal(receipt_claim_digest(receipt), wc.digest()):
        raise VerificationError("lift_povw output claim digest mismatch")
    return receipt


def join_povw(left: SuccinctReceipt, right: SuccinctReceipt,
              unwrap: bool = False) -> SuccinctReceipt:
    """Join two WorkClaim receipts: claims must chain AND nonce ranges must
    be contiguous; work values sum.  With `unwrap`, the joined receipt
    carries the bare ReceiptClaim (join_unwrap_povw; reference
    recursion/prove/mod.rs:137-173)."""
    from .povw import WorkClaim

    ids, leaves, root = _allowed()
    group = MerkleGroup(leaves)
    name = "join_unwrap_povw" if unwrap else "join_povw"
    prog = load_own_program(name)
    tape = [int(w) for w in np.asarray(root, np.uint32)]
    for r in (left, right):
        tape += _proof_words(group, r.control_id)
        tape += [int(w) for w in np.asarray(r.seal, np.uint32)]
        tape += _claim_body_words(r.claim.claim)
        tape += _work_tape_words(r.claim.work)
    joined_claim = ReceiptClaim(
        pre=left.claim.claim.pre, post=right.claim.claim.post,
        exit_code=right.claim.claim.exit_code,
        input=left.claim.claim.input, output=right.claim.claim.output)
    joined_work = left.claim.work.join(right.claim.work)
    claim = joined_claim if unwrap else WorkClaim(joined_claim, joined_work)
    receipt = prove_zkr(prog, ids[name], leaves, tape, claim=claim)
    if not np.array_equal(receipt_claim_digest(receipt), claim.digest()):
        raise VerificationError(f"{name} output claim digest mismatch")
    return receipt


def unwrap_povw(inner: SuccinctReceipt) -> SuccinctReceipt:
    """SuccinctReceipt[WorkClaim] -> SuccinctReceipt[ReceiptClaim],
    discarding the work record (reference recursion/prove/mod.rs:336-352)."""
    ids, leaves, root = _allowed()
    group = MerkleGroup(leaves)
    prog = load_own_program("unwrap_povw")
    tape = [int(w) for w in np.asarray(root, np.uint32)]
    tape += _proof_words(group, inner.control_id)
    tape += [int(w) for w in np.asarray(inner.seal, np.uint32)]
    tape += _claim_body_words(inner.claim.claim)
    tape += _work_tape_words(inner.claim.work)
    claim = inner.claim.claim
    receipt = prove_zkr(prog, ids["unwrap_povw"], leaves, tape, claim=claim)
    if not np.array_equal(receipt_claim_digest(receipt), claim.digest()):
        raise VerificationError("unwrap_povw output claim digest mismatch")
    return receipt


def resolve_povw(conditional: SuccinctReceipt, assumption: SuccinctReceipt,
                 unwrap: bool = False) -> SuccinctReceipt:
    """Resolve the head assumption of a WorkClaim-wrapped conditional
    receipt; the work record passes through unchanged (reference
    recursion/prove/mod.rs:255-332).  `assumption` is a plain (non-PoVW)
    succinct receipt."""
    from .claims import (Assumptions, MaybePruned, Output, opt_digest)
    from .povw import WorkClaim

    wc = conditional.claim
    claim = wc.claim
    out = claim.output.value if hasattr(claim.output, "value") \
        else claim.output
    if out is None or not out.assumptions.value.items:
        raise VerificationError("conditional receipt has no assumptions")
    items = out.assumptions.value.items
    head = items[0]
    head_claim = head.value.claim if hasattr(head, "value") else head.claim
    head_claim = np.asarray(
        head_claim if isinstance(head_claim, np.ndarray)
        else head_claim.digest(), np.uint32)
    rest_digest = Assumptions(list(items[1:])).digest()
    journal = np.asarray(out.journal if isinstance(out.journal, np.ndarray)
                         else out.journal.digest(), np.uint32)

    ids, leaves, root = _allowed()
    group = MerkleGroup(leaves)
    name = "resolve_unwrap_povw" if unwrap else "resolve_povw"
    prog = load_own_program(name)
    sys_exit, user_exit = claim.exit_code.into_pair()
    tape = [int(w) for w in np.asarray(root, np.uint32)]
    tape += _proof_words(group, conditional.control_id)
    tape += [int(w) for w in np.asarray(conditional.seal, np.uint32)]
    for d in (opt_digest(claim.input), claim.pre.digest(),
              claim.post.digest()):
        tape += [int(w) for w in np.asarray(d, np.uint32)]
    tape += [sys_exit, user_exit]
    for d in (journal, head_claim, rest_digest):
        tape += [int(w) for w in np.asarray(d, np.uint32)]
    tape += _work_tape_words(wc.work)
    tape += _proof_words(group, assumption.control_id)
    tape += [int(w) for w in np.asarray(assumption.seal, np.uint32)]

    resolved = ReceiptClaim(
        pre=claim.pre, post=claim.post, exit_code=claim.exit_code,
        input=claim.input,
        output=MaybePruned.of(Output(
            MaybePruned.from_digest(journal),
            MaybePruned.from_digest(rest_digest))))
    rclaim = resolved if unwrap else WorkClaim(resolved, wc.work)
    receipt = prove_zkr(prog, ids[name], leaves, tape, claim=rclaim)
    if not np.array_equal(receipt_claim_digest(receipt), rclaim.digest()):
        raise VerificationError(f"{name} output claim digest mismatch")
    return receipt


def compress_composite_povw(composite) -> SuccinctReceipt:
    """PoVW compress: lift_povw every segment, join_povw the chain,
    resolve any assumption receipts, and unwrap the final WorkClaim on the
    last merge (prover_impl povw flow + composite_to_succinct_povw).
    Returns (succinct receipt over the bare session claim, total Work)."""
    lifted = [lift_povw(sr) for sr in composite.segments]
    assumptions = list(composite.assumption_receipts)
    if len(lifted) == 1 and not assumptions:
        total = lifted[0].claim.work
        return unwrap_povw(lifted[0]), total
    acc = lifted[0]
    for nxt in lifted[1:-1] if not assumptions else lifted[1:]:
        acc = join_povw(acc, nxt)
    if not assumptions:
        total = acc.claim.work.join(lifted[-1].claim.work)
        return join_povw(acc, lifted[-1], unwrap=True), total
    total = acc.claim.work
    for i, ar in enumerate(assumptions):
        acc = resolve_povw(acc, _as_succinct(ar),
                           unwrap=i == len(assumptions) - 1)
    return acc, total


def _as_succinct(receipt):
    """Top-level Receipt -> its inner succinct receipt (reference
    InnerAssumptionReceipt conversion, receipt.rs succinct())."""
    if hasattr(receipt, "inner"):
        if receipt.inner.kind != "succinct":
            raise VerificationError(
                f"cannot resolve with a {receipt.inner.kind} assumption "
                "receipt; compress it to succinct first")
        return receipt.inner.value
    return receipt


def compress_composite(composite) -> SuccinctReceipt:
    """Lift every segment receipt, left-fold joins, then resolve-fold the
    assumption receipts head-first (reference prove/mod.rs:337-391
    composite_to_succinct)."""
    lifted = [lift(sr) for sr in composite.segments]
    acc = lifted[0]
    for nxt in lifted[1:]:
        acc = join(acc, nxt)
    for ar in composite.assumption_receipts:
        acc = resolve(acc, _as_succinct(ar))
    return acc


def keccak_union_root(pending_keccaks) -> SuccinctReceipt | None:
    """Prove every pending keccak request and union-merge the receipts
    into the MMR root receipt that resolves the guest's keccak root
    assumption (reference prover_impl.rs:121-139)."""
    if not pending_keccaks:
        return None
    mmr = MerkleMountainAccumulator()
    for req in pending_keccaks:
        mmr.insert(prove_keccak_request(req))
    return mmr.root()
