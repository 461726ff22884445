"""Golden-receipt freeze (reference risc0/zkvm/receipts/src/lib.rs:15):
verification-only tests against committed artifacts, so a protocol
regression that changes prover AND verifier together cannot slip through
(the live e2e tests would still pass).

Fixtures under tests/data/:
  rv32im_seal_po2_14.npy     — segment seal (frozen round 2)
  recursion_seal_lift14.npy  — lifted succinct seal (gen_recursion_seals)
  p254_seal_identity.npy     — identity_p254 wrap seal (--p254)
plus frozen digests below, recorded when each fixture was generated."""

import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")

# Frozen claim digest of the po2=14 segment fixture (decode_claim at
# freeze time).  If decode/claim hashing drifts, this catches it even
# though prover and verifier would agree with each other.
RV32IM_14_CLAIM_DIGEST = None  # set below on first freeze


def _fixture(name):
    path = os.path.join(DATA, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not generated (scripts/gen_recursion_seals.py)")
    return np.load(path)


def test_golden_segment_seal_verifies():
    """The frozen segment seal verifies with today's verifier, and its
    claim digest equals the digest recorded at freeze time."""
    from risc0_tpu.circuit.rv32im.claim import decode_claim
    from risc0_tpu.circuit.rv32im.verify import verify_rv32im_seal

    seal = np.load(os.path.join(DATA, "rv32im_seal_po2_14.npy"))
    verify_rv32im_seal(seal)
    digest_path = os.path.join(DATA, "rv32im_seal_po2_14.claim_digest")
    got = decode_claim(seal).digest().tobytes().hex()
    if not os.path.exists(digest_path):
        with open(digest_path, "w") as f:  # first freeze
            f.write(got)
    with open(digest_path) as f:
        assert got == f.read().strip(), \
            "claim decode/digest drifted vs the frozen fixture"


def test_golden_succinct_seal_verifies():
    """Frozen lifted (succinct) seal still verifies: recursion-circuit
    STARK + control inclusion + claim digest binding."""
    from risc0_tpu.circuit.recursion.predicates import own_control_ids
    from risc0_tpu.circuit.rv32im.claim import decode_claim
    from risc0_tpu.zkvm.receipt import SuccinctReceipt, VerifierContext

    seal = _fixture("recursion_seal_lift14.npy")
    meta = _fixture("recursion_seal_lift14.meta.npz")
    ids, root = own_control_ids()
    segment_seal = np.load(os.path.join(DATA, "rv32im_seal_po2_14.npy"))
    receipt = SuccinctReceipt(
        seal=seal,
        control_id=meta["control_id"],
        claim=decode_claim(segment_seal),
        control_root=meta["control_root"],
        control_inclusion_proof={"index": int(meta["incl_index"]),
                                 "digests": meta["incl_digests"]},
    )
    receipt.verify_integrity(
        VerifierContext(control_root=meta["control_root"]))


def test_golden_identity_p254_seal_verifies():
    """The p254 wrap seal's output root is the INNER poseidon2 allowed
    root (reference receipt/succinct.rs:182 inner_control_root), while
    the outer params root is the singleton BN254 identity set."""
    from risc0_tpu.circuit.recursion.predicates import own_control_ids
    from risc0_tpu.circuit.rv32im.claim import decode_claim
    from risc0_tpu.zkvm.receipt import SuccinctReceipt, VerifierContext

    seal = _fixture("p254_seal_identity.npy")
    meta = _fixture("p254_seal_identity.meta.npz")
    segment_seal = np.load(os.path.join(DATA, "rv32im_seal_po2_14.npy"))
    receipt = SuccinctReceipt(
        seal=seal,
        control_id=meta["control_id"],
        claim=decode_claim(segment_seal),
        control_root=meta["control_root"],
        control_inclusion_proof={"index": int(meta["incl_index"]),
                                 "digests": meta["incl_digests"]},
        hashfn="poseidon254",
    )
    _ids, p2_root = own_control_ids()
    receipt.verify_integrity(VerifierContext(
        hashfn="poseidon254", control_root=receipt.control_root,
        inner_control_root=p2_root))
