"""ECDSA example guest (examples/ecdsa.py) — in-guest secp256k1
signature verification over the bigint2 accelerator, mirroring the
reference's ecdsa example (examples/ecdsa/methods/guest/src/main.rs):
accept a valid signature, journal (pubkey, digest), reject tampering."""

import hashlib
import importlib.util
import sys
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "ecdsa_example",
    Path(__file__).resolve().parent.parent / "examples" / "ecdsa.py")
E = importlib.util.module_from_spec(_spec)
sys.modules["ecdsa_example"] = E
_spec.loader.exec_module(E)

from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl  # noqa: E402

MSG = b"signed for the test suite"
Z = int.from_bytes(hashlib.sha256(MSG).digest(), "big") % E.N
PRIV = 0x7E57_00D1_CE5E_C2E7 % E.N


def _run(stdin: bytes):
    elf = E.build_guest(len(MSG))
    env = ExecutorEnv(segment_po2=17).write_slice(stdin)
    return ExecutorImpl(env, elf).run()


def test_guest_accepts_valid_signature_and_journals_key_and_digest():
    qx, qy = E._ec_mul(PRIV, E.G)
    r, s = E._sign(PRIV, Z)
    sess = _run(MSG + E._le(qx) + E._le(qy) + E._le(r) + E._le(s))
    assert sess.exit_code == ("Halted", 0)
    assert bytes(sess.journal) == \
        E._le(qx) + E._le(qy) + hashlib.sha256(MSG).digest()


def test_guest_rejects_bad_signature_wrong_key_and_zero_s():
    qx, qy = E._ec_mul(PRIV, E.G)
    r, s = E._sign(PRIV, Z)
    # bit-flipped s
    sess = _run(MSG + E._le(qx) + E._le(qy) + E._le(r) + E._le(s ^ 1))
    assert sess.exit_code == ("Halted", 1)
    # signature from a different key
    r2, s2 = E._sign((PRIV * 7) % E.N, Z)
    sess = _run(MSG + E._le(qx) + E._le(qy) + E._le(r2) + E._le(s2))
    assert sess.exit_code == ("Halted", 1)
    # s = 0 rejected before any field op
    sess = _run(MSG + E._le(qx) + E._le(qy) + E._le(r) + E._le(0))
    assert sess.exit_code == ("Halted", 1)


def test_host_sign_roundtrip_matches_guest_math():
    """The host-side sign (used to build fixtures) is itself consistent:
    u1*G + u2*Q recovers a point with x == r."""
    q = E._ec_mul(PRIV, E.G)
    r, s = E._sign(PRIV, Z)
    sinv = pow(s, -1, E.N)
    pt = E._ec_add(E._ec_mul(Z * sinv % E.N, E.G),
                   E._ec_mul(r * sinv % E.N, q))
    assert pt[0] % E.N == r
