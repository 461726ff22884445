"""On-chain leg: generated Solidity verifier + calldata seal format.

No solc in this image, so the tests validate the generated contracts by
(a) parsing the emitted vk constants back and re-running the pairing
check in Python over the frozen golden receipt, and (b) checking the
in-contract ReceiptClaim hashing layout (mirrored byte-for-byte by the
python model functions the generator embeds) against zkvm.claims.
"""

import os

import numpy as np
import pytest

from risc0_tpu.groth16 import solidity as S

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "tests", "data")
CONTRACTS = os.path.join(REPO, "contracts")


def _golden():
    path = os.path.join(DATA, "groth16_receipt_golden.npz")
    if not os.path.exists(path):
        pytest.skip("no golden groth16 receipt fixture")
    return np.load(path)


def _golden_vk(z):
    from risc0_tpu.groth16 import native as nat
    from risc0_tpu.groth16.verifier import VerifyingKey

    if "vk_ic" not in z.files:
        pytest.skip("golden has no embedded vk")
    return VerifyingKey(
        alpha_g1=nat.g1_from_arr(z["vk_alpha_g1"])[0],
        beta_g2=nat.g2_from_arr(z["vk_beta_g2"])[0],
        gamma_g2=nat.g2_from_arr(z["vk_gamma_g2"])[0],
        delta_g2=nat.g2_from_arr(z["vk_delta_g2"])[0],
        ic=nat.g1_from_arr(z["vk_ic"]))


def test_generated_vk_constants_roundtrip():
    z = _golden()
    vk = _golden_vk(z)
    text = S.generate_groth16_verifier(vk)
    back = S.parse_vk_from_sol(text)
    assert back.alpha_g1 == vk.alpha_g1
    assert back.beta_g2 == vk.beta_g2
    assert back.gamma_g2 == vk.gamma_g2
    assert back.delta_g2 == vk.delta_g2
    assert back.ic == list(vk.ic)


def test_committed_contracts_in_sync_with_golden():
    """contracts/*.sol must be regenerable from the committed fixtures
    (scripts/gen_solidity_verifier.py) — catches drift."""
    from risc0_tpu.circuit.recursion.predicates import (
        identity_p254_control_id, own_control_ids)
    from risc0_tpu.groth16.wrap import verifier_parameters

    z = _golden()
    vk = _golden_vk(z)
    params = verifier_parameters(vk)
    _ids, root = own_control_ids()
    want1 = S.generate_groth16_verifier(vk)
    want2 = S.generate_risczero_verifier(root, identity_p254_control_id(),
                                         params.digest())
    got1 = open(os.path.join(CONTRACTS, "Groth16Verifier.sol")).read()
    got2 = open(os.path.join(CONTRACTS,
                             "RiscZeroGroth16Verifier.sol")).read()
    assert got1 == want1 and got2 == want2


def test_calldata_roundtrip_and_selector_check():
    z = _golden()
    vk = _golden_vk(z)
    from risc0_tpu.groth16.wrap import verifier_parameters

    params = verifier_parameters(vk)
    seal = bytes(z["seal"].tobytes())
    calldata = S.seal_to_calldata(seal, params.digest())
    assert len(calldata) == 260
    sel, a, b, c = S.decode_calldata(calldata, params.digest())
    assert sel == S.selector_from_params(params.digest())
    # decoded == direct parse of the raw seal
    w = [int.from_bytes(seal[32 * i: 32 * i + 32], "big") for i in range(8)]
    assert a == (w[0], w[1]) and c == (w[6], w[7])
    assert b == ((w[2], w[3]), (w[4], w[5]))
    with pytest.raises(ValueError, match="selector"):
        S.decode_calldata(b"\x00" * 4 + seal, params.digest())


def test_sol_claim_hashing_matches_zkvm_claims():
    from risc0_tpu.zkvm.claims import receipt_claim_ok

    rng = np.random.default_rng(3)
    for _ in range(4):
        image_id = rng.integers(0, 2**32, 8, dtype=np.uint32)
        journal = rng.integers(0, 2**32, 8, dtype=np.uint32)
        want = np.asarray(receipt_claim_ok(image_id, journal).digest(),
                          np.uint32).tobytes()
        got = S.sol_ok_claim_digest(image_id.tobytes(), journal.tobytes())
        assert got == want


def test_parsed_sol_vk_verifies_golden_seal():
    """The pairing check a deployed Groth16Verifier.sol would run (same
    vk constants, same public-signal derivation as the wrapper contract)
    accepts the frozen golden receipt."""
    from risc0_tpu.circuit.recursion.predicates import (
        identity_p254_control_id, own_control_ids)
    from risc0_tpu.groth16.verifier import Verifier

    z = _golden()
    text = open(os.path.join(CONTRACTS, "Groth16Verifier.sol")).read()
    vk = S.parse_vk_from_sol(text)
    _ids, root = own_control_ids()
    v = Verifier.from_seal(bytes(z["seal"].tobytes()), root,
                           z["claim_digest"],
                           identity_p254_control_id(), vk=vk)
    assert v.verify()


def test_receipt_seal_calldata_method():
    from risc0_tpu.zkvm.receipt import Groth16Receipt

    z = _golden()
    vk = _golden_vk(z)
    from risc0_tpu.groth16.wrap import verifier_parameters

    params = verifier_parameters(vk)
    r = Groth16Receipt(seal=bytes(z["seal"].tobytes()), claim=None,
                       verifier_parameters=params.digest())
    cd = r.seal_calldata()
    assert cd[:4] == S.selector_from_params(params.digest())
    assert cd[4:] == bytes(z["seal"].tobytes())


def test_emitter_matches_reference_ceremony_constants():
    """Emitting the ceremony verifying key must reproduce the constants
    in the reference's snarkjs verifier.sol byte-for-byte (operand order
    included) — pins our G2 (c1, c0) storage convention to the deployed
    contract's."""
    import re

    ref_path = "/root/reference/groth16_proof/groth16/verifier.sol"
    if not os.path.exists(ref_path):
        pytest.skip("reference verifier.sol not available")
    from risc0_tpu.groth16.verifier import GROTH16_VERIFIER_KEY

    ref = {m.group(1): int(m.group(2)) for m in re.finditer(
        r"uint256 constant (\w+) = (\d+);", open(ref_path).read())}
    ours = {m.group(1): int(m.group(2)) for m in re.finditer(
        r"uint256 constant (\w+) = (\d+);",
        S.generate_groth16_verifier(GROTH16_VERIFIER_KEY))}
    for k in ("alphax", "alphay", "betax1", "betax2", "betay1", "betay2",
              "gammax1", "gammax2", "gammay1", "gammay2", "deltax1",
              "deltax2", "deltay1", "deltay2", "IC0x", "IC0y", "IC5x",
              "IC5y"):
        assert ours[k] == ref[k], f"{k}: {ours[k]} != {ref[k]}"
