"""Typed layout accessors (reference zirgen LAYOUT_GLOBAL statics +
layout::Reg readers): attribute access, digest/u32 readers, and
consistency with the claim decoder."""

import numpy as np
import pytest

from risc0_tpu.circuit.layout import (LayoutView, rv32im_global_layout,
                                      rv32im_inject_layout)


def test_global_layout_structure():
    g = rv32im_global_layout()
    assert isinstance(g.state_in.values[0].low.offset, int)
    assert len(g.state_in.values) == 8
    assert g.rng.offset == 49
    assert g.term_a0low.offset == 87
    assert "state_out" in g.keys()
    with pytest.raises(AttributeError):
        g.nonexistent_field
    with pytest.raises(TypeError):
        g.state_in.offset  # a struct, not a register


def test_typed_readers():
    g = rv32im_global_layout()
    row = np.zeros(90, np.uint32)
    # write a digest into state_in lo/hi pairs, read it back
    want = (np.arange(0x10000, 0x10008, dtype=np.uint64) * 0x9E370001
            % (1 << 32)).astype(np.uint32)
    for i, w in enumerate(want):
        row[g.state_in.values[i].low.offset] = w & 0xFFFF
        row[g.state_in.values[i].high.offset] = w >> 16
    got = g.state_in.read_digest(row)
    assert np.array_equal(got, want.astype(np.uint32))
    row[g.term_a0low.offset] = 0x1234
    row[g.term_a0high.offset] = 0x5678
    pair = LayoutView({"low": {"_super": g.term_a0low.offset},
                       "high": {"_super": g.term_a0high.offset}})
    assert pair.read_u32_pair(row) == 0x56781234
    assert g.rng.read(row) == 0


def test_claim_decode_consistency():
    """The layout readers reproduce the claim decoder's pre-state digest
    on a real seal."""
    seal = np.load("tests/data/rv32im_seal_po2_14.npy")
    from risc0_tpu import field as F
    from risc0_tpu.circuit.rv32im.claim import decode_claim

    claim = decode_claim(seal)
    globals_std = F.decode_np(np.asarray(seal[1:91], np.uint32))
    g = rv32im_global_layout()
    pre = g.state_in.read_digest(globals_std)
    assert np.array_equal(pre, claim.pre.value.merkle_root)


def test_inject_layout_arms():
    inj = rv32im_inject_layout()
    assert isinstance(inj.cycle.offset, int)
    assert len(inj.bigint_state) == 22
    assert len(inj.p2_state) == 39
