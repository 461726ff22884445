"""Keccak seal verification (reference keccak/src/prove/mod.rs:59-71):
run the generic STARK verifier with the extracted keccak circuit; the
seal has no version word and no code-root check."""

from __future__ import annotations

import numpy as np

from ...hash.suite import POSEIDON2
from ...verify import verifier as V
from .circuit import load_circuit


def verify_keccak_seal(seal) -> np.ndarray:
    """Verify a keccak seal; returns the 17 global words."""
    seal = np.asarray(seal, np.uint32)
    circuit = load_circuit()
    return V.verify(circuit, POSEIDON2, seal, lambda po2, root: None)


def keccak_digest_from_globals(out, montgomery=False) -> np.ndarray:
    """Reassemble the final SHA-256 transcript digest from the 16 global
    shorts (reference keccak prove/mod.rs:148-153).  Seal globals read by
    the verifier are Montgomery words; pass montgomery=True to decode."""
    from ... import field as F
    from .witgen import GLOBAL_META

    if montgomery:
        out = F.decode_np(np.asarray(out, np.uint32))
    dig = [int(out[c]) for c in GLOBAL_META["final_digest"]]
    return np.array([dig[2 * i] | (dig[2 * i + 1] << 16) for i in range(8)],
                    np.uint32)
