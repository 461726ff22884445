"""Device exec witgen vs the host C++ interpreter (bit-exactness).

The if-converted exec graph + two-pass histogram algorithm
(exec_device.py) must reproduce csrc/witgen.cpp's data/global/table
outputs exactly on real executed segments across guest shapes that
exercise the different arms: plain compute (loop), the SHA-256
accelerator pipeline, and a PoVW-nonce session.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl  # noqa: E402


def _compare(seg, rand_z=(5, 6, 7, 8)):
    from risc0_tpu.circuit.rv32im import exec_device as E
    from risc0_tpu.circuit.rv32im.witgen import witgen_exec

    want = witgen_exec(seg, rand_z=rand_z)
    got = E.witgen_exec_np(seg, rand_z=rand_z)
    mis = np.argwhere(got["data"] != want["data"])
    assert mis.size == 0, \
        f"{len(mis)} mismatching data cells, first {mis[:5].tolist()}"
    assert np.array_equal(got["global"], want["global"])
    assert np.array_equal(got["tables_u8"], want["tables_u8"])
    assert np.array_equal(got["tables_u16"], want["tables_u16"])
    return want


def test_exec_device_matches_cpp_loop():
    elf = open("/root/repo/guests/loop.bin", "rb").read()
    env = ExecutorEnv(segment_po2=16).write_slice((100).to_bytes(4,
                                                                 "little"))
    seg = ExecutorImpl(env, elf).run().segments[0]
    _compare(seg)


def test_exec_device_matches_cpp_sha_guest():
    """SHA accelerator rows: exercises the deep back-reads (back 7/15/
    16/68) and the sha injector columns."""
    from sha import build_guest

    msg = b"exec-device sha conformance vector " * 3
    elf = build_guest(len(msg))
    env = ExecutorEnv(segment_po2=16).write_slice(msg)
    seg = ExecutorImpl(env, elf).run().segments[0]
    _compare(seg)


def test_exec_device_matches_cpp_povw_nonce():
    from risc0_tpu.zkvm.povw import PovwJobId

    job = PovwJobId(log=0xABCDEF0123456789ABCDEF0123456789ABCDEF01,
                    job=0x1122334455667788)
    elf = open("/root/repo/guests/loop.bin", "rb").read()
    env = ExecutorEnv(segment_po2=16, povw_job_id=job).write_slice(
        (60).to_bytes(4, "little"))
    seg = ExecutorImpl(env, elf).run().segments[0]
    _compare(seg)


def test_exec_device_agrees_on_corrupt_input():
    """The device path must reject (via its bad-row mask) traces the C++
    rejects, when the corruption hits the in-circuit EQZ checks."""
    from risc0_tpu.circuit.rv32im import exec_device as E
    from risc0_tpu.circuit.rv32im.witgen import witgen_exec

    elf = open("/root/repo/guests/loop.bin", "rb").read()
    env = ExecutorEnv(segment_po2=16).write_slice((30).to_bytes(4,
                                                                "little"))
    seg = ExecutorImpl(env, elf).run().segments[0]
    from risc0_tpu.zkvm.exec import preflight_segment

    pf = dict(preflight_segment(seg))
    cyc = pf["cycles"].copy()
    cyc[len(cyc) // 4, 2] ^= 1   # flip a major selector in the body
    pf["cycles"] = cyc
    try:
        witgen_exec(seg, rand_z=(5, 6, 7, 8), pf=dict(pf))
        cpp_ok = True
    except RuntimeError:
        cpp_ok = False
    if cpp_ok:
        pytest.skip("corruption not rejected by the C++ oracle")
    with pytest.raises(RuntimeError, match="failed in-circuit checks"):
        E.witgen_exec_np(seg, rand_z=(5, 6, 7, 8), pf=dict(pf))


@pytest.mark.skipif(
    not __import__("os").environ.get("RISC0_TPU_SLOW_TESTS"),
    reason="big jit compile (7.5k-group chunk body)")
def test_exec_device_jnp_matches_cpp():
    """The jitted two-pass register-file executor matches the host C++
    bit-exactly (data born on device).  Compiled-backend only: XLA:CPU's
    LLVM JIT cannot allocate the code section for the 7.5k-group chunk
    body ('Cannot allocate memory' with >100 GB free); the numpy
    executor above is the CPU conformance anchor."""
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("XLA:CPU LLVM JIT cannot hold the exec chunk body")
    from risc0_tpu.circuit.rv32im import exec_device as E
    from risc0_tpu.circuit.rv32im.witgen import witgen_exec

    elf = open("/root/repo/guests/loop.bin", "rb").read()
    env = ExecutorEnv(segment_po2=16).write_slice((100).to_bytes(4,
                                                                 "little"))
    seg = ExecutorImpl(env, elf).run().segments[0]
    want = witgen_exec(seg, rand_z=(5, 6, 7, 8))
    got = E.witgen_exec_device(seg, rand_z=(5, 6, 7, 8))
    assert np.array_equal(np.asarray(got["data"]), want["data"])
    assert np.array_equal(got["global"], want["global"])
    assert np.array_equal(got["tables_u8"], want["tables_u8"])
    assert np.array_equal(got["tables_u16"], want["tables_u16"])
