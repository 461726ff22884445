"""In-repo Groth16 prover tests: native BN254 core, R1CS gadgets vs host
implementations, small-circuit prove/verify roundtrip, and (gated) the
stark_verify circuit over a real poseidon254 fib seal.

Reference parity: risc0/groth16/src/prove/ (rapidsnark/docker path) and
groth16_proof/groth16/stark_verify.circom — here generated and proved
in-process (csrc/bn254.cpp + groth16/{r1cs,gadgets,stark_verify,prove}.py).
"""

import os
import random

import numpy as np
import pytest

from risc0_tpu import field as F
from risc0_tpu.groth16 import bn254 as bn
from risc0_tpu.groth16 import gadgets as G
from risc0_tpu.groth16 import native as nat
from risc0_tpu.groth16 import prove as GP
from risc0_tpu.groth16.r1cs import CS, Q
from risc0_tpu.groth16.verifier import Verifier
from risc0_tpu.hash import poseidon254 as p254

SLOW = os.environ.get("RISC0_TPU_SLOW_TESTS") != "1"


def _verifier(proof, vk, publics=None):
    return Verifier(
        (int(proof["pi_a"][0]), int(proof["pi_a"][1])),
        ((int(proof["pi_b"][0][0]), int(proof["pi_b"][0][1])),
         (int(proof["pi_b"][1][0]), int(proof["pi_b"][1][1]))),
        (int(proof["pi_c"][0]), int(proof["pi_c"][1])),
        publics if publics is not None
        else [int(x) for x in proof["public"]], vk)


def test_native_bn254_ops():
    rng = random.Random(1)
    ks = [rng.randrange(bn.R) for _ in range(30)] + [0]
    # fixed-base vs double-and-add
    outs = nat.g1_fixed_msm(bn.G1_GEN, ks)
    assert nat.g1_from_arr(outs) == [
        bn.g1_mul(bn.G1_GEN, k) if k else None for k in ks]
    # variable-base MSM vs sum of muls
    pts = [bn.g1_mul(bn.G1_GEN, rng.randrange(1, 999)) for _ in range(16)]
    ref = None
    for p, k in zip(pts, ks):
        ref = bn.g1_add(ref, bn.g1_mul(p, k))
    assert nat.g1_msm(nat.g1_arr(pts), ks[:16]) == ref
    # G2 order + linearity via native ops
    out = np.zeros(16, np.uint64)
    nat.lib().bn254_g2_mul(nat.g2_arr([bn.G2_GEN])[0], nat.limbs(bn.R), out)
    assert nat.g2_from_arr(out)[0] is None


def test_native_fr_ntt_roundtrip():
    rng = random.Random(2)
    n = 64
    root = pow(5, (Q - 1) // n, Q)
    vals = [rng.randrange(Q) for _ in range(n)]
    a = nat.fr_arr(vals)
    nat.fr_ntt(a, root)
    j = 5
    assert nat.fr_list(a[j:j + 1])[0] == \
        sum(vals[i] * pow(root, i * j, Q) for i in range(n)) % Q
    nat.fr_ntt(a, root, inverse=True)
    assert nat.fr_list(a) == vals


def test_poseidon254_gadget_matches_host():
    rng = random.Random(3)
    cs = CS(check=True)
    vals = [rng.randrange(Q) for _ in range(3)]
    out = G.p254_permute(cs, [cs.witness(v) for v in vals])
    assert [o.val for o in out] == p254.permute(vals)

    elems = [rng.randrange(F.P) for _ in range(23)]
    got = G.p254_hash_slice(cs, [G.bb_input(cs, v) for v in elems])
    ref = p254.digest_to_fr(p254.unpadded_hash(
        np.array([F.s_encode(v) for v in elems], np.uint32)))
    assert got.val == ref


def test_rng_gadget_matches_host():
    rng = random.Random(4)
    cs = CS(check=True)
    g = G.RngGadget(cs)
    h = p254.Poseidon254Rng()
    for _ in range(2):
        d = rng.randrange(Q)
        g.mix(cs.witness(d))
        h.mix(p254.fr_to_digest(d))
    bits = g.random_bits(20)
    assert sum(b.val << i for i, b in enumerate(bits)) == h.random_bits(20)
    assert g.random_elem().val == F.s_decode(h.random_elem())
    assert [x.val for x in g.random_ext_elem()] == \
        [int(v) for v in F.decode_np(h.random_ext_elem())]


def test_babybear_ext_gadgets_match_host():
    rng = random.Random(5)
    cs = CS(check=True)
    a = [rng.randrange(F.P) for _ in range(4)]
    b = [rng.randrange(F.P) for _ in range(4)]
    abb = [G.bb_input(cs, v) for v in a]
    bbb = [G.bb_input(cs, v) for v in b]
    acc = G.ext_mul(cs, abb, bbb)
    ref = F.ext_mul_np(F.encode_np(np.array(a, np.uint32)),
                       F.encode_np(np.array(b, np.uint32)))
    for _ in range(6):  # exercise lazy reduction chains
        acc = G.ext_mul(cs, acc, bbb)
        ref = F.ext_mul_np(ref, F.encode_np(np.array(b, np.uint32)))
    assert [x.val for x in acc] == [int(v) for v in F.decode_np(ref)]
    inv = G.ext_inv(cs, acc)
    assert [x.val for x in inv] == \
        [int(v) for v in F.decode_np(F.ext_inv_np(ref))]


def test_groth16_roundtrip_small_circuit():
    def build(x_val, y_val):
        cs = CS(check=True)
        pub = cs.alloc_public()
        x = cs.witness(x_val)
        y = cs.witness(y_val)
        out = (x * y + x + 7) * (x * y + x + 7) + y
        cs.bind_public(pub, out)
        cs.finalize()
        return cs

    cs = build(3, 4)
    pk, vk = GP.setup(cs)
    proof = GP.prove(pk, cs)
    assert _verifier(proof, vk).verify()
    # second witness against the same CRS
    cs2 = build(10, 20)
    proof2 = GP.prove(pk, cs2)
    assert _verifier(proof2, vk).verify()
    # wrong public input rejected
    bad = [int(proof2["public"][0]) + 1]
    assert not _verifier(proof2, vk, bad).verify()
    # mismatched circuit rejected
    cs3 = build(3, 4)
    cs3.assert_zero(cs3.zero())  # different structure
    with pytest.raises(AssertionError):
        GP.prove(pk, cs3)


def _fib_builder(seal, check):
    from risc0_tpu.circuit import fib
    from risc0_tpu.groth16.stark_verify import StarkVerifyBuilder

    def fib_poly_ext(b, poly_mix, eval_u):
        cs = b.cs
        a, s0, s1, rec, fini, x0, x1, x2 = eval_u
        out = b.out
        mix = b.mix_elems
        eb = lambda bb: G.ext_from_base(bb, cs)
        cons = [
            G.ext_mul(cs, s0, G.ext_sub(x0, eb(out[0]))),
            G.ext_mul(cs, s1, G.ext_sub(x0, eb(out[1]))),
            G.ext_mul(cs, rec, G.ext_sub(x0, G.ext_add(x1, x2))),
            G.ext_mul(cs, fini, G.ext_sub(x0, eb(out[2]))),
            G.ext_mul(cs, G.ext_add(G.ext_add(s0, s1),
                                    G.ext_add(rec, fini)),
                      G.ext_sub(a, G.ext_mul_base(cs, x0, mix[0]))),
        ]
        tot = G.ext_zero(cs)
        cur = G.ext_one(cs)
        for c in cons:
            tot = G.ext_add(tot, G.ext_mul(cs, cur, c))
            cur = G.ext_mul(cs, cur, poly_mix)
        return tot

    def bind_fib(b):
        cs = b.cs
        cs.bind_public(b.pub_a0, b.out[0].sig)
        cs.bind_public(b.pub_a1, b.out[1].sig)
        cs.bind_public(b.pub_c0, b.out[2].sig)
        cs.bind_public(b.pub_c1, cs.zero())
        cs.bind_public(b.pub_id, b.code_root)

    return StarkVerifyBuilder(seal[1:], po2=6, circuit=fib.FibCircuit,
                              check=check, poly_ext_gadget=fib_poly_ext,
                              bind_publics=bind_fib)


@pytest.mark.skipif(SLOW, reason="slow crypto e2e (RISC0_TPU_SLOW_TESTS=1)")
def test_stark_verify_circuit_fib_p254():
    """The full STARK-verifier R1CS holds over an honest poseidon254 fib
    seal (every constraint eagerly checked) and a tampered seal is
    rejected during witness building."""
    from risc0_tpu.circuit import fib
    from risc0_tpu.hash.suite import POSEIDON254

    seal = fib.prove(po2=6, suite=POSEIDON254)
    b = _fib_builder(seal, check=True)
    assert b.cs.num_constraints > 100_000
    assert b.public_values()[0] == 1  # fib f0

    bad = np.array(seal)
    bad[40] = (int(bad[40]) + 1) % F.P
    with pytest.raises((AssertionError, ZeroDivisionError)):
        _fib_builder(bad, check=True)
