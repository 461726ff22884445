"""End-to-end STARK prove/verify over the fib AIR (slice of reference
host/server/prove/tests.rs style: honest proof verifies, corrupted seals don't).
"""

import numpy as np
import pytest

from risc0_tpu import field as F
from risc0_tpu.circuit import fib
from risc0_tpu.verify.verifier import VerificationError


def test_prove_verify_po2_6():
    seal = fib.prove(po2=6)
    out = fib.verify(seal)
    # f_last = fib value at row active-1
    f = [1, 1]
    active = 64 - 16
    for _ in range(2, active):
        f.append((f[-1] + f[-2]) % F.P)
    assert int(F.decode_np(out[2:3])[0]) == f[active - 1]


def test_prove_verify_with_fri_rounds():
    # po2=9: 512 cycles > FRI_MIN_DEGREE=256 -> one fold round
    seal = fib.prove(po2=9)
    fib.verify(seal)


def test_corrupted_seal_rejected():
    seal = np.array(fib.prove(po2=6))
    # flip a value somewhere in the middle of the seal
    seal[len(seal) // 2] ^= 1
    with pytest.raises((VerificationError, AssertionError)):
        fib.verify(seal)


def test_different_seeds_same_output_different_seal():
    s1 = fib.prove(po2=6, seed=1)
    s2 = fib.prove(po2=6, seed=2)
    assert len(s1) == len(s2)
    assert not np.array_equal(s1, s2)  # zk blinding must differ
    fib.verify(s1)
    fib.verify(s2)


def test_sha256_suite_prove_verify():
    """The sha-256 hash suite drives the full prove/verify path (Merkle
    hashing + Fiat-Shamir via ShaRng), mirroring the reference's per-suite
    receipt support."""
    from risc0_tpu.hash.suite import SHA256

    seal = fib.prove(po2=6, suite=SHA256)
    fib.verify(seal, suite=SHA256)
    # a poseidon2 verifier must reject a sha seal
    with pytest.raises((VerificationError, AssertionError, Exception)):
        fib.verify(seal)
