"""Fibonacci AIR — minimal end-to-end circuit for the STARK pipeline.

A purpose-built three-group circuit (accum/code/data, mirroring the reference
group structure, risc0/zkp/src/adapter.rs:27-29) that exercises every protocol
phase: selector-gated boundary/recurrence constraints, a mix-dependent accum
column, ZK blinding rows, DEEP taps at backs {0,1,2}, and combo sharing.

Layout:
  globals (OUT, size 3): [f0, f1, f_last]
  code    (4 cols): s0 (row 0), s1 (row 1), rec (rows 2..active-1),
                    fini (row active-1)  — deterministic per po2
  data    (1 col):  x — the Fibonacci sequence, random in blinding rows
  accum   (1 col):  a = mix[0] * x on active rows, random in blinding rows
  mix     (size 4): Fiat-Shamir randomness drawn after code/data commits

Constraints (tot = sum_i poly_mix^i * C_i):
  C0: s0   * (x - f0)
  C1: s1   * (x - f1)
  C2: rec  * (x - x@1 - x@2)
  C3: fini * (x - f_last)
  C4: (s0 + s1 + rec + fini) * (a - mix0 * x)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ... import field as F
from ...core import poly
from ...hal import jnp_hal as hal
from ...prove.prover import Prover
from ...taps import (REGISTER_GROUP_ACCUM, REGISTER_GROUP_CODE,
                     REGISTER_GROUP_DATA, TapSet)
from ...verify import verifier as V

SEAL_VERSION = 1
CIRCUIT_INFO = b"fib-tpu:v1______"
OUTPUT_SIZE = 3
MIX_SIZE = 4
NUM_CONSTRAINTS = 5
INV_RATE = 4

TAPS = TapSet.from_backs(
    ("accum", "code", "data"),
    [
        [[0]],                      # accum: a
        [[0], [0], [0], [0]],       # code: s0, s1, rec, fini
        [[0, 1, 2]],                # data: x
    ],
)


def _zk_rows(cycles: int) -> int:
    """Blinding rows (reference uses ZK_CYCLES=1024 at po2>=13)."""
    return min(1024, cycles // 4)


def witgen(po2: int, f0: int = 1, f1: int = 1, seed: int | None = None):
    """Build code/data witnesses + globals (host, standard->Montgomery)."""
    cycles = 1 << po2
    active = cycles - _zk_rows(cycles)
    rng = np.random.default_rng(seed)

    x = np.zeros(cycles, np.uint64)
    x[0], x[1] = f0 % F.P, f1 % F.P
    for i in range(2, active):
        x[i] = (x[i - 1] + x[i - 2]) % F.P
    x[active:] = rng.integers(0, F.P, size=cycles - active)

    code = np.zeros((4, cycles), np.uint32)
    code[0, 0] = 1
    code[1, 1] = 1
    code[2, 2:active] = 1
    code[3, active - 1] = 1

    out = np.array([f0 % F.P, f1 % F.P, x[active - 1]], np.uint32)
    return (
        F.encode_np(code),
        F.encode_np(x.astype(np.uint32))[None, :],
        F.encode_np(out),
        active,
    )


def accum_witgen(data_mont: np.ndarray, mix_mont: np.ndarray, active: int,
                 seed: int | None = None):
    cycles = data_mont.shape[1]
    rng = np.random.default_rng(None if seed is None else seed + 1)
    a = F.mul_np(data_mont[0], np.full(cycles, mix_mont[0], np.uint32))
    a[active:] = F.encode_np(rng.integers(0, F.P, size=cycles - active, dtype=np.uint32))
    return a[None, :]


@jax.jit
def _eval_check_impl(accum, code, data, pm_pows, mix0, out_g, inv_zeros):
    a = accum[0]
    s0, s1, rec, fini = code[0], code[1], code[2], code[3]
    x0 = data[0]
    x1 = jnp.roll(x0, INV_RATE * 1)
    x2 = jnp.roll(x0, INV_RATE * 2)

    cons = [
        F.mul(s0, F.sub(x0, jnp.full_like(x0, out_g[0]))),
        F.mul(s1, F.sub(x0, jnp.full_like(x0, out_g[1]))),
        F.mul(rec, F.sub(x0, F.add(x1, x2))),
        F.mul(fini, F.sub(x0, jnp.full_like(x0, out_g[2]))),
        F.mul(F.add(F.add(s0, s1), F.add(rec, fini)),
              F.sub(a, F.mul(x0, jnp.full_like(x0, mix0)))),
    ]
    tot = jnp.zeros((x0.shape[0], 4), jnp.uint32)
    for i, c in enumerate(cons):
        tot = F.add(tot, F.mul(pm_pows[i][None, :], c[:, None]))
    ret = F.mul(tot, inv_zeros[:, None])
    return ret.T  # (4, domain) planar


class FibCircuitHal:
    """Device eval_check (mirrors reference rv32im prove/hal/cpu.rs:144-207)."""

    def eval_check(self, groups, globals_list, poly_mix, po2):
        mix_g, out_g = globals_list  # montgomery (4,), (3,)
        accum, code, data = groups
        cycles = 1 << po2
        domain = cycles * INV_RATE

        pm = np.asarray(poly_mix, np.uint32)
        pm_pows = np.zeros((NUM_CONSTRAINTS, 4), np.uint32)
        cur = poly.ext_one()
        for i in range(NUM_CONSTRAINTS):
            pm_pows[i] = cur
            cur = F.ext_mul_np(cur, pm)

        # zeros polynomial (3*x)^cycles - 1 has period-4 values over the domain
        w = F.s_encode(F.ROU_FWD[po2 + 2])
        k = F.s_pow(F.s_encode(3), cycles)
        wq = F.s_pow(w, cycles)  # 4th root of unity
        ys = []
        cw = F.R % F.P
        for _ in range(4):
            ys.append(F.s_inv(F.s_sub(F.s_mul(k, cw), F.R % F.P)))
            cw = F.s_mul(cw, wq)
        inv_zeros = np.tile(np.array(ys, np.uint32), domain // 4)

        return _eval_check_impl(
            accum, code, data, jnp.asarray(pm_pows),
            jnp.uint32(int(mix_g[0])), jnp.asarray(np.asarray(out_g, np.uint32)),
            jnp.asarray(inv_zeros))


def poly_ext(poly_mix, eval_u, out, mix):
    """Host constraint evaluation at the DEEP point (verifier side)."""
    u = [np.asarray(e, np.uint32) for e in eval_u]
    a, s0, s1, rec, fini, x0, x1, x2 = u
    out = np.asarray(out, np.uint32)
    mix = np.asarray(mix, np.uint32)

    def scale(sel, val):
        return F.ext_mul_np(sel, val)

    def c_sub(v, scalar_mont):
        e = np.zeros(4, np.uint32)
        e[0] = scalar_mont
        return F.sub_np(v, e)

    cons = [
        scale(s0, c_sub(x0, int(out[0]))),
        scale(s1, c_sub(x0, int(out[1]))),
        scale(rec, F.sub_np(x0, F.add_np(x1, x2))),
        scale(fini, c_sub(x0, int(out[2]))),
        scale(F.add_np(F.add_np(s0, s1), F.add_np(rec, fini)),
              F.sub_np(a, F.mul_np(x0, np.uint32(mix[0])))),
    ]
    tot = poly.ext_zero()
    cur = poly.ext_one()
    for c in cons:
        tot = F.add_np(tot, F.ext_mul_np(cur, c))
        cur = F.ext_mul_np(cur, np.asarray(poly_mix, np.uint32))
    return tot


class FibCircuit:
    taps = TAPS
    CIRCUIT_INFO = CIRCUIT_INFO
    OUTPUT_SIZE = OUTPUT_SIZE
    MIX_SIZE = MIX_SIZE

    @staticmethod
    def poly_ext(poly_mix, eval_u, out, mix):
        return poly_ext(poly_mix, eval_u, out, mix)


def prove(po2: int, f0: int = 1, f1: int = 1, suite=None, seed: int = 0):
    """Produce a fib seal (mirrors rv32im prove/hal/mod.rs:160-224 flow)."""
    from ...hash.suite import POSEIDON2

    suite = suite or POSEIDON2
    code, data, out, active = witgen(po2, f0, f1, seed)

    prover = Prover(suite, TAPS)
    iop = prover.iop
    iop.write_u32s([SEAL_VERSION])

    info = np.frombuffer(V.PROOF_SYSTEM_INFO.ljust(16, b"\0")[:16], np.uint8)
    iop.commit(suite.hash_elem_slice(F.encode_np(info.astype(np.uint32))))
    info = np.frombuffer(CIRCUIT_INFO.ljust(16, b"\0")[:16], np.uint8)
    iop.commit(suite.hash_elem_slice(F.encode_np(info.astype(np.uint32))))

    header = np.concatenate([out, np.array([po2], np.uint32)])  # po2 raw
    iop.commit(suite.hash_elem_slice(header))
    iop.write_field_elems(header)
    prover.set_po2(po2)

    prover.commit_group(REGISTER_GROUP_CODE, jnp.asarray(code))
    prover.commit_group(REGISTER_GROUP_DATA, jnp.asarray(data))

    mix = np.array([iop.random_elem() for _ in range(MIX_SIZE)], np.uint32)
    accum = accum_witgen(data, mix, active, seed)
    prover.commit_group(REGISTER_GROUP_ACCUM, jnp.asarray(accum))

    return prover.finalize([mix, out], FibCircuitHal())


def code_root(po2: int, suite_name: str = "poseidon2") -> np.ndarray:
    """Deterministic code-group Merkle root for check_code."""
    from ...prove.prover import PolyGroup

    code, _, _, _ = witgen(po2)
    pg = PolyGroup(hal.make_coeffs(jnp.asarray(code)), suite_name=suite_name)
    return pg.merkle.root


def verify(seal: np.ndarray, suite=None):
    from ...hash.suite import POSEIDON2

    suite = suite or POSEIDON2
    seal = np.asarray(seal, np.uint32)
    assert seal[0] == SEAL_VERSION, "bad seal version"

    def check_code(po2, root):
        expected = code_root(po2, suite.name)
        if not np.array_equal(np.asarray(root), expected):
            raise V.VerificationError("code root mismatch")

    return V.verify(FibCircuit(), suite, seal[1:], check_code)
