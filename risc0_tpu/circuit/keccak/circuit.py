"""Keccak circuit object: extracted taps + constraint-poly IR.

Reuses the rv32im IR evaluator class (the zirgen-generated SSA shape is
identical; only the taps/sizes/info differ).  Reference:
keccak-sys/kernels/cuda/eval_check_*.cu, keccak/src/zirgen/{taps.rs,info.rs}.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

from ..rv32im.circuit import Rv32imCircuit, _taps_to_tapset

_DATA = os.path.join(os.path.dirname(__file__), "data")

CIRCUIT_INFO = b"KECCAK:v1_______"  # reference zirgen/info.rs:23
OUTPUT_SIZE = 17
MIX_SIZE = 4


@lru_cache(maxsize=1)
def load_circuit() -> Rv32imCircuit:
    tz = np.load(os.path.join(_DATA, "taps.npz"))
    ir = np.load(os.path.join(_DATA, "poly_fp_ir.npz"), allow_pickle=True)
    taps = _taps_to_tapset(tz)
    c = Rv32imCircuit(
        taps, ir["opcode"], ir["operands"], ir["n_f"], ir["n_e"],
        ir["fscr_size"], ir["escr_size"], ir["ret"],
        ir["mix_powers"] if "mix_powers" in ir.files else None)
    c.CIRCUIT_INFO = CIRCUIT_INFO
    c.OUTPUT_SIZE = OUTPUT_SIZE
    c.MIX_SIZE = MIX_SIZE
    return c
