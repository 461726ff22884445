"""rv32im circuit: taps + constraint polynomial, loaded from extracted data.

The circuit definition (tap set + the DEEP-ALI constraint polynomial as a flat
SSA IR) is extracted from the reference's zirgen-generated artifacts by
scripts/extract_rv32im.py — see that script for provenance.  This package owns
the evaluators:

  * ``poly_ext`` — verifier-side evaluation at the DEEP point (substitutes
    for the reference's generated poly_ext.rs, absent from the snapshot)
  * ``eval_check`` — prover-side evaluation over the 4x domain (device)
"""

from .circuit import CIRCUIT_INFO, MIX_SIZE, OUTPUT_SIZE, Rv32imCircuit, load_circuit

__all__ = ["Rv32imCircuit", "load_circuit", "CIRCUIT_INFO", "OUTPUT_SIZE",
           "MIX_SIZE"]
