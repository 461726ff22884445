"""In-VM verifier generator: the emitted recursion program must accept a
real fib seal (preflight EQ checks all pass) and reject tampered ones."""

import numpy as np
import pytest

from risc0_tpu import field as F
from risc0_tpu.circuit.recursion.asm import Asm
from risc0_tpu.circuit.recursion.preflight import RecursionPreflight
from risc0_tpu.circuit.recursion.zkr_verify import (CircuitSpec, Gen,
                                                    gen_verify)


def _fib_poly_ext_emit(gen, pm, u, out, mix):
    a = gen.a
    acc, s0, s1, rec, fini, x0, x1, x2 = u
    cons = [
        a.mul(s0, a.sub(x0, out[0])),
        a.mul(s1, a.sub(x0, out[1])),
        a.mul(rec, a.sub(x0, a.add(x1, x2))),
        a.mul(fini, a.sub(x0, out[2])),
        a.mul(a.add(a.add(s0, s1), a.add(rec, fini)),
              a.sub(acc, a.mul(x0, mix[0]))),
    ]
    tot = a.const(0)
    cur = a.const(1)
    for c in cons:
        tot = a.add(tot, a.mul(cur, c))
        cur = a.mul(cur, pm)
    return tot


def _fib_spec(po2):
    from risc0_tpu.circuit import fib

    root = fib.code_root(po2)
    root_std = [int(F.decode_np(np.asarray(root, np.uint32))[i])
                for i in range(8)]

    def check_code(gen, _po2, root_cells):
        for cell, want in zip(root_cells, root_std):
            gen.a.eq(cell, gen.a.const(want))

    return CircuitSpec(
        taps=fib.TAPS, circuit_info=fib.CIRCUIT_INFO,
        output_size=fib.OUTPUT_SIZE, mix_size=fib.MIX_SIZE,
        poly_ext_emit=_fib_poly_ext_emit, check_code_emit=check_code,
        version_word=fib.SEAL_VERSION)


@pytest.fixture(scope="module")
def fib_seal():
    from risc0_tpu.circuit import fib
    return np.asarray(fib.prove(po2=6), np.uint32)


@pytest.fixture(scope="module")
def fib_verify_prog():
    a = Asm()
    gen = Gen(a)
    out_cells, _ = gen_verify(gen, _fib_spec(6), po2=6)
    for c in out_cells:
        a.output(c)
    return a


def test_invm_verifier_accepts_fib_seal(fib_seal, fib_verify_prog):
    prog = fib_verify_prog.program(18)
    pf = RecursionPreflight([int(w) for w in fib_seal])
    pf.run(prog.code)  # raises on any EQ failure
    # outputs = the 3 fib globals (abstract form)
    want = F.decode_np(fib_seal[1:4])
    assert pf.output[:3] == [int(w) for w in want]
    print(f"program rows: {len(prog.code)}")


def test_invm_verifier_rejects_tampered_seal(fib_seal, fib_verify_prog):
    prog = fib_verify_prog.program(18)
    for idx in (2, 5, 40, len(fib_seal) - 7):
        bad = fib_seal.copy()
        bad[idx] ^= 1
        pf = RecursionPreflight([int(w) for w in bad])
        with pytest.raises((ValueError, IndexError)):
            pf.run(prog.code)
