"""PoVW predicate variants (lift_rv32im_povw / join_povw / unwrap_povw):
in-VM WorkClaim construction must match the host-side Work/WorkClaim
digests bit-exactly (reference recursion/prove/mod.rs:88-173,336-352 and
claim/work.rs semantics)."""

import numpy as np
import pytest

from risc0_tpu.zkvm.povw import PovwJobId, PovwNonce, Work, WorkClaim

SEAL_PATH = "tests/data/rv32im_seal_po2_14.npy"


@pytest.fixture(scope="module")
def povw_lift_prog():
    from risc0_tpu.circuit.recursion import predicates as pr
    return pr.lift_rv32im_povw(14)


def test_decode_work_zero_nonce_seal():
    """The cached seal was proved without PoVW: its Work record is the
    zero nonce with value = 1 << po2."""
    from risc0_tpu.circuit.rv32im.claim import decode_work

    work = decode_work(np.load(SEAL_PATH))
    assert work.nonce_min == PovwNonce.ZERO
    assert work.nonce_max == PovwNonce.ZERO
    assert work.value == 1 << 14


def test_work_join_host_semantics():
    job = PovwJobId(log=7, job=9)
    w0 = Work(job.nonce(0), job.nonce(0), 1 << 14)
    w1 = Work(job.nonce(1), job.nonce(1), 1 << 15)
    j = w0.join(w1)
    assert j.nonce_min == job.nonce(0)
    assert j.nonce_max == job.nonce(1)
    assert j.value == (1 << 14) + (1 << 15)
    from risc0_tpu.zkvm.povw import WorkError
    with pytest.raises(WorkError):
        w1.join(w0)  # non-contiguous
    with pytest.raises(WorkError):
        w0.join(w0)  # overlapping


def test_lift_povw_preflight_matches_host_work_claim(povw_lift_prog):
    """Build lift_rv32im_povw(14) and run the recursion preflight over a
    real segment seal: every in-VM EQ must hold and the output must equal
    WorkClaim{decode_claim(seal), decode_work(seal)}.digest()."""
    from risc0_tpu.circuit.recursion.preflight import RecursionPreflight
    from risc0_tpu.circuit.rv32im.claim import decode_claim, decode_work

    seal = np.load(SEAL_PATH)
    prog = povw_lift_prog
    root = np.arange(8, dtype=np.uint32)  # echoed verbatim
    tape = [int(w) for w in root] + [int(w) for w in seal]
    pf = RecursionPreflight(tape)
    pf.run(prog.code)

    out = pf.output
    assert out[:8] == [int(w) for w in root]
    want = WorkClaim(decode_claim(seal), decode_work(seal)).digest()
    assert out[8:] == [int(w) & 0xFFFF for w in want]


def test_lift_povw_preflight_rejects_tampered_nonce_globals(povw_lift_prog):
    """Flipping a povw_nonce global in the seal breaks the STARK transcript
    check in-VM (the globals are committed in the seal header)."""
    from risc0_tpu.circuit.recursion.preflight import RecursionPreflight

    seal = np.load(SEAL_PATH).copy()
    seal[1 + 33] ^= 1  # povw_nonce first short (layout reg 33)
    prog = povw_lift_prog
    tape = [0] * 8 + [int(w) for w in seal]
    with pytest.raises((ValueError, IndexError)):
        RecursionPreflight(tape).run(prog.code)
