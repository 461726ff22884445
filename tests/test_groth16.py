"""BN254 pairing + Groth16 verifier: algebraic sanity and the reference's
test vectors (vendored from risc0/groth16/tests/data, pure JSON data)."""

import json

import numpy as np
import pytest

from risc0_tpu.groth16 import bn254 as bn
from risc0_tpu.groth16 import Verifier, split_digest


def test_generators_on_curve():
    assert bn.g1_is_on_curve(bn.G1_GEN)
    assert bn.g2_is_on_curve(bn.G2_GEN)
    # subgroup order
    assert bn.g1_mul(bn.G1_GEN, bn.R) is None


def test_pairing_bilinearity():
    e1 = bn.pairing(bn.g1_mul(bn.G1_GEN, 2), bn.G2_GEN)
    e2 = bn.pairing(bn.G1_GEN, bn.G2_GEN)
    assert e1 == bn.f12_mul(e2, e2)
    assert e1 != bn.F12_ONE
    # e(P, Q) * e(-P, Q) == 1
    assert bn.multi_pairing_is_one(
        [(bn.G1_GEN, bn.G2_GEN), (bn.g1_neg(bn.G1_GEN), bn.G2_GEN)])


def test_groth16_reference_vectors():
    """The reference's own proof/vk/public test triple must verify
    (risc0/groth16/tests/verify.rs)."""
    proof = json.load(open("tests/data/groth16/proof.json"))
    public = json.load(open("tests/data/groth16/public.json"))
    vk = json.load(open("tests/data/groth16/verification_key.json"))
    v = Verifier.from_json(proof, public, vk)
    assert v.verify()

    # tampered public input must fail
    bad = Verifier.from_json(proof, [str(int(public[0]) + 1)], vk)
    assert not bad.verify()


def test_split_digest():
    d = np.arange(8, dtype=np.uint32) * 0x01020304
    lo, hi = split_digest(d)
    be = d.tobytes()[::-1]
    assert hi == int.from_bytes(be[:16], "big")
    assert lo == int.from_bytes(be[16:], "big")


def test_verifier_parameters_digest_matches_reference():
    """Reference receipt/groth16.rs:200-205 stable-digest golden: our
    tagged hashing of (control_root, bn254_control_id, vk_digest) must
    reproduce the published parameters digest for the reference's
    published constants."""
    import numpy as np
    from risc0_tpu.zkvm.receipt import Groth16ReceiptVerifierParameters

    def digest(hexstr):
        return np.frombuffer(bytes.fromhex(hexstr), np.uint32).copy()

    params = Groth16ReceiptVerifierParameters(
        control_root=digest(
            "3b304d1098ad401d3a04bc11976f476633a71b482b7851189663ca61209abe45"),
        bn254_control_id=digest(
            "c07a65145c3cb48b6101962ea607a4dd93c753bb26975cb47feb00d3666e4404"))
    got = params.digest().tobytes().hex()
    assert got == ("3880c9eb6bf2f1a7824608786aff4ed0b018e8ea18b7de6df0b511"
                   "0c1915b65f")


def test_seal_to_json_via_derived_types():
    """seal_to_json (reference groth16/src/prove/seal_to_json.rs): the
    Fp/Digest spans are derived by replaying the verifier transcript, the
    whole seal is consumed, and every value is the decimal standard form
    (Fp) or BN254 Fr (digest)."""
    import json

    import jax

    jax.config.update("jax_platforms", "cpu")
    from risc0_tpu import field as F
    from risc0_tpu.circuit import fib
    from risc0_tpu.groth16.seal_to_json import derive_seal_types, to_json
    from risc0_tpu.hash.suite import POSEIDON2

    seal = np.asarray(fib.prove(po2=6), np.uint32)[1:]  # drop version word
    types = derive_seal_types(seal, suite=POSEIDON2,
                              circuit=fib.FibCircuit())
    n_words = sum(1 if t == "fp" else 8 for t in types)
    assert n_words == len(seal)
    assert "digest" in types and "fp" in types

    # value conversion on a synthetic iop (fib's poseidon2 digests need not
    # be canonical Fr; identity_p254 seals are by construction)
    mini = np.array([F.s_encode(7)] + [1, 0, 0, 0, 0, 0, 0, 0], np.uint32)
    blob = json.loads(to_json(mini, types=["fp", "digest"]))
    assert blob["iop"] == ["7", "1"]
    with pytest.raises(ValueError, match="length mismatch"):
        to_json(mini[:-1], types=["fp", "digest"])


def test_proof_json_to_seal_roundtrip():
    """proof_json_to_seal encodes snarkjs JSON into the 256-byte seal
    layout Verifier.from_seal decodes — the same (a, b, c) points must
    come back out and still verify against the reference vectors."""
    import json

    from risc0_tpu.groth16 import bn254 as bn
    from risc0_tpu.groth16.verifier import (Verifier, proof_json_to_seal,
                                            verifying_key_from_json)

    d = "/root/repo/tests/data/groth16"
    proof = json.load(open(f"{d}/proof.json"))
    public = json.load(open(f"{d}/public.json"))
    vk_json = json.load(open(f"{d}/verification_key.json"))

    seal = proof_json_to_seal(proof)
    assert len(seal) == 256
    via_json = Verifier.from_json(proof, public, vk_json)

    w = [int.from_bytes(seal[32 * i: 32 * i + 32], "big") for i in range(8)]
    a = (w[0], w[1])
    b = ((w[3], w[2]), (w[5], w[4]))
    c = (w[6], w[7])
    assert (a, b, c) == (via_json.a, via_json.b, via_json.c)
    v = Verifier(a, b, c, [int(x) for x in public],
                 verifying_key_from_json(vk_json))
    assert v.verify()
