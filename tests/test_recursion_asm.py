"""Assembler for self-authored recursion programs: preflight semantics,
in-VM poseidon hashing vs the host hash suite, and a full prove+verify of a
small self-authored program (our own control ID, not a released zkr)."""

import numpy as np
import pytest

from risc0_tpu import field as F
from risc0_tpu.circuit.recursion.asm import Asm
from risc0_tpu.circuit.recursion.preflight import RecursionPreflight


def _run(asm, inputs=(), po2=11):
    prog = asm.program(po2)
    pf = RecursionPreflight(list(inputs))
    pf.run(prog.code)
    return prog, pf


def test_asm_micro_semantics():
    a = Asm()
    c5 = a.const(5)
    c7 = a.const(7, 3)            # (7, 3, 0, 0)
    s = a.add(c5, c7)             # (12, 3, 0, 0)
    d = a.sub(c7, c5)             # (2, 3, 0, 0)
    m = a.mul(c5, c7)             # (35, 15, 0, 0)
    i = a.inv(c5)                 # ext inverse of 5
    z = a.iszero(c5)              # 0
    e3 = a.extract(c7, 1)         # component 1 = 3
    a.eq(z, a.const(0))           # passes (both zero cellwise)
    sel = a.select(a.const(1), c5, 2)   # wom[c5 + 2*1] = wom[c7] .. addr math
    _, pf = _run(a)
    assert pf.wom[s] == (12, 3, 0, 0)
    assert pf.wom[d] == (2, 3, 0, 0)
    assert pf.wom[m] == (35, 15, 0, 0)
    assert pf.wom[i][0] == pow(5, F.P - 2, F.P)
    assert pf.wom[z] == (0, 0, 0, 0)
    assert pf.wom[e3] == (3, 0, 0, 0)
    assert pf.wom[sel] == pf.wom[c5 + 2]


def test_asm_poseidon_hash_matches_suite():
    """In-VM sponge (load 16 mont + permute + store mont) must equal the host
    hash_elem_slice over the same Montgomery words."""
    from risc0_tpu.hash.suite import POSEIDON2

    rng = np.random.default_rng(0)
    vals = rng.integers(0, F.P, 16, dtype=np.uint32)

    a = Asm()
    addrs = [a.const(int(F.s_encode(int(v)))) for v in vals]
    # consts are standard-form writes; poseidon do_mont load expects the WOM
    # value to be Montgomery — s_encode gives us Montgomery consts.
    a.p2_load(addrs[:8], group=0, do_mont=1, keep_state=0, keep_upper=0)
    a.p2_load(addrs[8:], group=1, do_mont=1, keep_state=1, keep_upper=1,
              prep_full=True)
    a.p2_permute()
    base = a.p2_store(group=0, do_mont=1)
    _, pf = _run(a)
    got = np.array([pf.wom[base + i][0] for i in range(8)], np.uint32)
    want = POSEIDON2.hash_elem_slice(F.encode_np(vals))
    assert np.array_equal(got, want)


def test_asm_iop_read_and_output():
    """READ_IOP header/body and the output stream."""
    a = Asm()
    a.read_iop_header(4, k=1)
    vals = [a.read_iop_body(do_mont=True) for _ in range(4)]
    tot = a.add(vals[0], vals[1])
    for v in vals[2:]:
        tot = a.add(tot, v)
    a.output(tot)
    words = [17, 100, 3, F.P - 2]
    _, pf = _run(a, inputs=words)
    # k=1 reads decode Montgomery; body do_mont re-encodes: value round-trips
    assert pf.wom[vals[0]] == (17, 0, 0, 0)
    assert pf.output == [sum(words) % F.P]


@pytest.mark.parametrize("nbytes", [64, 170])
def test_asm_sha256_matches_hashlib(nbytes):
    """In-VM sha rows (init/load/mix/fini) over padded blocks must equal
    hashlib.sha256 of the message bytes."""
    import hashlib

    msg = bytes(range(nbytes % 251)) * 4
    msg = (msg * ((nbytes // len(msg)) + 1))[:nbytes]
    # standard SHA padding to whole blocks
    padded = msg + b"\x80" + b"\x00" * ((55 - nbytes) % 64) \
        + (8 * nbytes).to_bytes(8, "big")
    words = np.frombuffer(padded, "<u4")

    a = Asm()
    addrs = [a.const(int(w) & 0xFFFF, int(w) >> 16) for w in words]
    dig = a.sha256(addrs)
    _, pf = _run(a)
    got = np.array([pf.wom[dig[i]][0] | (pf.wom[dig[i]][1] << 16)
                    for i in range(8)], np.uint32)
    want = np.frombuffer(hashlib.sha256(msg).digest(), np.uint32)
    assert np.array_equal(got, want)


def test_asm_prove_verify_own_program():
    """Prove a self-authored recursion program at po2=11 and verify the seal
    cryptographically with our recursion verifier, checking the program's own
    control ID as code root.  First self-authored zkr end to end."""
    from risc0_tpu.circuit.recursion.circuit import verify_recursion_seal
    from risc0_tpu.circuit.recursion.prove import prove_program
    from risc0_tpu.verify.verifier import VerificationError

    a = Asm()
    # read 8 words, square each, sum, emit to output globals
    a.read_iop_header(8, k=1)
    vals = [a.read_iop_body(do_mont=True) for _ in range(8)]
    sq = [a.mul(v, v) for v in vals]
    tot = sq[0]
    for s in sq[1:]:
        tot = a.add(tot, s)
    ex = a.extract(tot, 0)
    outs = []
    for i in range(16):  # 4 global slots x 4 addrs
        outs.append(a.add(ex, a.const(i)))
    for k in range(4):
        a.set_global(outs[4 * k], k)
    prog = a.program(11)

    rng = np.random.default_rng(6)
    inp = [int(x) for x in rng.integers(0, F.P, 8)]
    seal, _out = prove_program(prog, inp, rng=np.random.default_rng(9))

    want_id = prog.control_id()
    seen = {}

    def check(po2, root):
        seen["po2"] = po2
        if not np.array_equal(np.asarray(root), want_id):
            raise VerificationError("control id mismatch")

    out = verify_recursion_seal(seal, check)
    assert seen["po2"] == 11
    expect = sum(v * v for v in inp) % F.P
    got = F.decode_np(np.asarray(out[:2], np.uint32))
    assert int(got[0]) == expect          # slot 0 = outs[0] component 0
    assert int(got[1]) == 0               # component 1 of (expect, 0,..)

    bad = np.array(seal)
    bad[100] ^= 1
    with pytest.raises(VerificationError):
        verify_recursion_seal(bad, check)
