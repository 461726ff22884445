"""Recursion circuit (STARK-verifier VM): taps, constraint bytecode, control IDs.

Circuit data extracted from the reference's generated artifacts by
scripts/extract_recursion.py; the PolyExtStep interpreter here follows the
documented executor semantics (risc0/zkp/src/adapter.rs:152-401).
"""

from .circuit import (ALLOWED_CONTROL_ROOT, CIRCUIT_INFO, MIX_SIZE,
                      OUTPUT_SIZE, RECURSION_PO2, RecursionCircuit,
                      load_circuit, verify_recursion_seal)

__all__ = ["RecursionCircuit", "load_circuit", "verify_recursion_seal",
           "CIRCUIT_INFO", "OUTPUT_SIZE", "MIX_SIZE", "RECURSION_PO2",
           "ALLOWED_CONTROL_ROOT"]
