"""Adversarial tests at the claim-encoding layer against the in-VM
predicate verifiers (VERDICT r2 item 10; reference seal-corruption tests in
risc0/zkvm/src/host/server/prove/tests.rs): forged control-inclusion
proofs, wrong exit codes, po2/program mismatch, truncated seals, and
non-chained joins must all be rejected by the recursion preflight
interpreter (i.e. an in-VM EQ/range assertion fires — a prover cannot
produce a witness, let alone a seal).

Runs against the frozen fixtures: rv32im_seal_po2_14 (committed) and
recursion_seal_lift14 (scripts/gen_recursion_seals.py; skipped if absent).
"""

import os

import numpy as np
import pytest

from risc0_tpu.circuit.recursion.preflight import RecursionPreflight
from risc0_tpu.circuit.recursion.predicates import (load_own_program,
                                                    own_control_ids)

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def rv32im_seal():
    return np.load(os.path.join(DATA, "rv32im_seal_po2_14.npy"))


@pytest.fixture(scope="module")
def lifted():
    """(seal, control_id, control_root, inclusion proof) of the frozen
    lifted receipt."""
    path = os.path.join(DATA, "recursion_seal_lift14.npy")
    if not os.path.exists(path):
        pytest.skip("recursion_seal_lift14 not generated "
                    "(scripts/gen_recursion_seals.py)")
    seal = np.load(path)
    meta = np.load(os.path.join(DATA, "recursion_seal_lift14.meta.npz"))
    return seal, meta["control_id"], meta["control_root"], \
        {"index": int(meta["incl_index"]),
         "digests": list(meta["incl_digests"])}


def _words(arr):
    return [int(w) for w in np.asarray(arr, np.uint32).ravel()]


def _claim_body_from_seal(seal):
    """input/pre/post/output digests + exit pair for the join tape, decoded
    host-side from the LIFTED seal's source segment claim.  We rebuild it
    from the committed rv32im fixture's claim (the lift preserves it)."""
    from risc0_tpu.circuit.rv32im.claim import decode_claim
    from risc0_tpu.zkvm.claims import opt_digest

    claim = decode_claim(np.load(os.path.join(DATA, "rv32im_seal_po2_14.npy")))
    sys_exit, user_exit = claim.exit_code.into_pair()
    words = []
    for d in (opt_digest(claim.input), claim.pre.digest(),
              claim.post.digest(), opt_digest(claim.output)):
        words.extend(_words(d))
    words.extend([sys_exit, user_exit])
    return words


def _join_tape(root, proof, seal, body, proof2=None, seal2=None, body2=None):
    tape = _words(root)
    for p, s, b in ((proof, seal, body),
                    (proof2 or proof, seal2 if seal2 is not None else seal,
                     body2 or body)):
        tape += [int(p["index"])]
        for d in p["digests"]:
            tape += _words(d)
        tape += _words(s)
        tape += list(b)
    return tape


def _expect_reject(prog, tape):
    pf = RecursionPreflight(tape)
    with pytest.raises((ValueError, IndexError, AssertionError, KeyError)):
        pf.run(prog.code)


def test_join_rejects_nonchained_receipts(lifted):
    """join(r, r): same receipt twice is not a valid chain unless
    post == pre — the in-VM pre/post equality must fire."""
    seal, _cid, root, proof = lifted
    body = _claim_body_from_seal(seal)
    prog = load_own_program("join")
    _expect_reject(prog, _join_tape(root, proof, seal, body))


def test_join_rejects_forged_inclusion_proof(lifted):
    """Corrupting a sibling digest of the control-inclusion proof must be
    caught by the in-VM Merkle walk against the allowed root."""
    seal, _cid, root, proof = lifted
    body = _claim_body_from_seal(seal)
    prog = load_own_program("join")
    bad = {"index": proof["index"],
           "digests": [d.copy() for d in proof["digests"]]}
    bad["digests"][0][0] ^= 1
    _expect_reject(prog, _join_tape(root, bad, seal, body))


def test_join_rejects_wrong_inclusion_index(lifted):
    seal, _cid, root, proof = lifted
    body = _claim_body_from_seal(seal)
    prog = load_own_program("join")
    bad = dict(proof)
    bad["index"] = int(proof["index"]) ^ 1
    _expect_reject(prog, _join_tape(root, bad, seal, body))


def test_join_rejects_wrong_exit_code(lifted):
    """Tampering the exit-code pair in the claim body changes the claim
    digest; the in-VM digest equality against the seal output must fire."""
    seal, _cid, root, proof = lifted
    body = _claim_body_from_seal(seal)
    prog = load_own_program("join")
    bad = list(body)
    bad[-1] ^= 1  # user exit code
    _expect_reject(prog, _join_tape(root, proof, seal, body, body2=bad))


def test_join_rejects_tampered_claim_digest_words(lifted):
    """Flipping a pre-state digest word in the claim body must be rejected
    (claim digest no longer matches the verified seal output)."""
    seal, _cid, root, proof = lifted
    body = _claim_body_from_seal(seal)
    prog = load_own_program("join")
    bad = list(body)
    bad[8] ^= 1  # first pre.digest word
    _expect_reject(prog, _join_tape(root, proof, seal, bad))


def test_join_rejects_wrong_allowed_root(lifted):
    seal, _cid, root, proof = lifted
    body = _claim_body_from_seal(seal)
    prog = load_own_program("join")
    bad_root = np.asarray(root, np.uint32).copy()
    bad_root[3] ^= 1
    _expect_reject(prog, _join_tape(bad_root, proof, seal, body))


def test_lift_rejects_po2_mismatched_program(rv32im_seal):
    """A po2=14 segment seal fed to lift_rv32im_15 must be rejected — the
    lift predicates are size-specialized (reference control_id.rs has one
    per po2) and the transcript shapes differ."""
    _ids, root = own_control_ids()
    prog = load_own_program("lift_rv32im_15")
    tape = _words(root) + _words(rv32im_seal)
    _expect_reject(prog, tape)


def test_lift_rejects_truncated_seal(rv32im_seal):
    _ids, root = own_control_ids()
    prog = load_own_program("lift_rv32im_14")
    tape = _words(root) + _words(rv32im_seal)[:-50]
    _expect_reject(prog, tape)


def test_lift_rejects_po2_header_tamper(rv32im_seal):
    """Rewriting the po2 header word (raw, index 91 after version+globals)
    breaks the Fiat-Shamir replay / merkle sizes in-VM."""
    _ids, root = own_control_ids()
    prog = load_own_program("lift_rv32im_14")
    bad = rv32im_seal.copy()
    assert int(bad[91]) == 14
    bad[91] = 15
    _expect_reject(prog, _words(root) + _words(bad))


def test_identity_rejects_foreign_control_id(lifted):
    """The identity predicate must reject an inclusion proof for a control
    id that is not in the allowed set (forged-membership attempt)."""
    seal, cid, root, proof = lifted
    prog = load_own_program("identity")
    # claim a different control id by shifting the proof index to a
    # different leaf (valid-looking but wrong digest path)
    bad = {"index": (int(proof["index"]) + 2) % 16,
           "digests": proof["digests"]}
    tape = _words(root)
    tape += [int(bad["index"])]
    for d in bad["digests"]:
        tape += _words(d)
    tape += _words(seal)
    _expect_reject(prog, tape)
