"""Decode an Rv32imV2Claim / ReceiptClaim from a segment seal's globals.

Reference: risc0/circuit/rv32im/src/lib.rs:116-177 (Rv32imV2Claim::decode),
risc0/zkvm/src/claim/receipt.rs:154-190 (decode_from_seal_v2) and
claim/receipt.rs:310-324 (exit code from terminate state).  The 90 global
registers are addressed through the extracted LAYOUT_GLOBAL tree; digests are
stored as 16-bit shorts (low, high per word).
"""

from __future__ import annotations

import json
import os

import numpy as np

from ... import field as F
from ...zkvm.claims import ExitCode, MaybePruned, ReceiptClaim, SystemState

OUTPUT_SIZE = 90
RV32IM_SEAL_VERSION = 2

_LAYOUT = None


def _layout() -> dict:
    global _LAYOUT
    if _LAYOUT is None:
        path = os.path.join(os.path.dirname(__file__), "data",
                            "global_layout.json")
        with open(path) as f:
            _LAYOUT = json.load(f)
    return _LAYOUT


def _reg(node) -> int:
    while isinstance(node, dict):
        node = node["_super"] if "_super" in node else next(iter(node.values()))
    return int(node)


def _digest_from_shorts(globals_std: np.ndarray, node: dict) -> np.ndarray:
    words = []
    for pair in node["values"]:
        low = int(globals_std[_reg(pair["low"])])
        high = int(globals_std[_reg(pair["high"])])
        if low >= 1 << 16 or high >= 1 << 16:
            raise ValueError("digest short out of range")
        words.append(low | (high << 16))
    return np.array(words, np.uint32)


def decode_claim(seal) -> ReceiptClaim:
    """Decode the claim committed by an rv32im segment seal."""
    seal = np.asarray(seal, np.uint32)
    if seal[0] != RV32IM_SEAL_VERSION:
        raise ValueError("seal version mismatch")
    globals_mont = seal[1 : 1 + OUTPUT_SIZE]
    g = F.decode_np(globals_mont)  # standard-form values
    lay = _layout()

    pre_state = _digest_from_shorts(g, lay["state_in"])
    post_state = _digest_from_shorts(g, lay["state_out"])
    input_digest = _digest_from_shorts(g, lay["input"])
    output_digest = _digest_from_shorts(g, lay["output"])
    is_terminate = int(g[_reg(lay["is_terminate"])])

    terminate_state = None
    exit_code = ExitCode("SystemSplit")
    output = None
    if is_terminate == 1:
        a0_high = int(g[_reg(lay["term_a0high"])])
        a0_low = int(g[_reg(lay["term_a0low"])])
        # HighLowU16(user_exit, halt_type): high half = user exit code,
        # low half = halt type (0 terminate, 1 pause)
        if a0_low == 0:
            exit_code = ExitCode("Halted", a0_high)
        elif a0_low == 1:
            exit_code = ExitCode("Paused", a0_high)
        else:
            raise ValueError(f"illegal halt type {a0_low}")
        terminate_state = (a0_high, a0_low)
        output = MaybePruned.from_digest(output_digest)

    # on Halted the decoded post state is the zero digest
    # (claim/receipt.rs:168-171)
    post_digest = np.zeros(8, np.uint32) if exit_code.kind == "Halted" \
        else post_state

    return ReceiptClaim(
        pre=MaybePruned.of(SystemState(0, pre_state)),
        post=MaybePruned.of(SystemState(0, post_digest)),
        exit_code=exit_code,
        input=MaybePruned.from_digest(input_digest),
        output=output if is_terminate == 1 else MaybePruned.from_digest(
            np.zeros(8, np.uint32)),
    )


def decode_work(seal) -> "Work":
    """Decode the PoVW Work record a lift_povw predicate would emit for
    this seal: single-nonce range from the povw_nonce globals, value =
    cycles proven = 1 << po2 (the per-po2 lift_rv32im_v2_povw program
    constant; reference recursion/prove/zkr.rs:70-76)."""
    from ...zkvm.povw import PovwNonce, Work

    seal = np.asarray(seal, np.uint32)
    if seal[0] != RV32IM_SEAL_VERSION:
        raise ValueError("seal version mismatch")
    g = F.decode_np(seal[1 : 1 + OUTPUT_SIZE])
    po2 = int(seal[1 + OUTPUT_SIZE])
    lay = _layout()
    halfs = []
    for pair in lay["povw_nonce"]["values"]:
        for key in ("low", "high"):
            v = int(g[_reg(pair[key])])
            if v >= 1 << 16:
                raise ValueError("nonce short out of range")
            halfs.append(v)
    nonce = PovwNonce.from_u16s(halfs)
    return Work(nonce_min=nonce, nonce_max=nonce, value=1 << po2)
