"""Keccak accelerator circuit (reference risc0/circuit/keccak).

Proves batches of keccak-f[1600] permutations, binding the input/output
states into a running SHA-256 transcript digest exposed in the globals
(reference keccak/src/lib.rs compute_keccak_digest).
"""

from .circuit import load_circuit  # noqa: F401
from .prove import prove_keccak  # noqa: F401
from .verify import verify_keccak_seal  # noqa: F401

KECCAK_DEFAULT_PO2 = 17  # reference keccak/src/lib.rs:27
KECCAK_PO2_RANGE = range(14, 19)
KECCAK_PERMUTE_CYCLES = 200  # cycles per preimage (preflight structure)
