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


def _carry_prog():
    """Tiny program: read two Work records, enforce contiguity, sum the
    values, output the joined Work digest (exercises _check_contiguous and
    _sum_u64 without a STARK verify)."""
    from risc0_tpu.circuit.recursion.asm import Asm
    from risc0_tpu.circuit.recursion.predicates import (
        RECURSION_PO2, _check_contiguous, _read_work, _sum_u64,
        _work_digest)
    from risc0_tpu.circuit.recursion.zkr_verify import Gen

    a = Asm()
    gen = Gen(a)
    lw = _read_work(gen)
    rw = _read_work(gen)
    _check_contiguous(gen, lw["max"], rw["min"])
    value = _sum_u64(gen, lw["value"], rw["value"])
    joined = _work_digest(gen, lw["min"], rw["max"], value)
    for c in joined:
        a.output(c)
    return a.program(RECURSION_PO2)


def _work_tape(*works):
    from risc0_tpu.zkvm.recursion_driver import _work_tape_words

    tape = []
    for w in works:
        tape += _work_tape_words(w)
    return tape


@pytest.mark.parametrize("job,segs,values", [
    (PovwJobId(log=7, job=9), (0, 1), (100, 200)),
    # carry ripples through the full segment word (0xFFFFFFFF + 1)
    (PovwJobId(log=2**159 + 5, job=2**63 + 1), (0xFFFFFFFE, 0xFFFFFFFF),
     (0xFFFF, 0x1_0000)),
    # value sum carries across u16 limbs
    (PovwJobId(log=1, job=1), (3, 4), (0xFFFF_FFFF, 1)),
])
def test_carry_arithmetic_in_vm_matches_host(job, segs, values):
    """The in-VM 16-limb contiguity check and u64 value sum agree with the
    host Work.join on representative carry patterns."""
    from risc0_tpu.circuit.recursion.preflight import RecursionPreflight

    w0 = Work(job.nonce(segs[0]), job.nonce(segs[0]), values[0])
    w1 = Work(job.nonce(segs[1]), job.nonce(segs[1]), values[1])
    prog = _carry_prog()
    pf = RecursionPreflight(_work_tape(w0, w1))
    pf.run(prog.code)
    want = w0.join(w1).digest()
    assert pf.output == [int(w) & 0xFFFF for w in want]


def test_carry_arithmetic_rejects_gap_and_overflow():
    from risc0_tpu.circuit.recursion.preflight import RecursionPreflight

    job = PovwJobId(log=3, job=4)
    prog = _carry_prog()
    # non-contiguous: segment 0 then 2
    w0 = Work(job.nonce(0), job.nonce(0), 5)
    w2 = Work(job.nonce(2), job.nonce(2), 5)
    with pytest.raises((ValueError, IndexError)):
        RecursionPreflight(_work_tape(w0, w2)).run(prog.code)
    # nonce_max + 1 overflows 256 bits: final carry must be rejected
    top = PovwNonce.from_u256((1 << 256) - 1)
    wtop = Work(top, top, 5)
    wzero = Work(PovwNonce.ZERO, PovwNonce.ZERO, 5)
    with pytest.raises((ValueError, IndexError)):
        RecursionPreflight(_work_tape(wtop, wzero)).run(prog.code)


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
