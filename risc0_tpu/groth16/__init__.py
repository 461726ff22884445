"""Groth16 receipt verification over BN254 (reference risc0/groth16/src/
{lib,types,verifier}.rs).

The verifying key constants are the public risc0-ethereum
Groth16Verifier.sol ceremony values (verifier.rs:34-75); proving stays
external (docker/bonsai in the reference, prove/docker.rs) — this module
verifies seals and converts formats.
"""

from .verifier import (GROTH16_VERIFIER_KEY, Verifier, VerifyingKey,
                       digest_as_fr_pair, fr_digest, split_digest,
                       verifying_key_from_json)

__all__ = [
    "Verifier", "VerifyingKey", "GROTH16_VERIFIER_KEY", "split_digest",
    "digest_as_fr_pair", "fr_digest", "verifying_key_from_json",
]
