"""Device accum witgen vs the host C++ interpreter (bit-exactness).

The if-converted graph + probe/scan algorithm (accum_device.py) must
reproduce csrc/witgen.cpp's output exactly on real executed segments —
the DualHal-style conformance pattern (reference zkp/src/hal/dual.rs).
"""

import numpy as np
import pytest

from risc0_tpu import field as F


def _loop_res(po2=16, count=100, seed=3):
    from risc0_tpu.circuit.rv32im.witgen import witgen_exec
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

    elf = open("/root/repo/guests/loop.bin", "rb").read()
    env = ExecutorEnv(segment_po2=po2).write_slice(count.to_bytes(4,
                                                                  "little"))
    seg = ExecutorImpl(env, elf).run().segments[0]
    rng = np.random.default_rng(seed)
    rand_z = tuple(int(x) for x in rng.integers(0, F.P, 4))
    res = witgen_exec(seg, rand_z=rand_z)
    mix = rng.integers(0, F.P, 36).astype(np.uint32)
    return res, mix


def test_accum_graph_builds():
    from risc0_tpu.circuit.rv32im import accum_device as AD

    ag = AD.accum_graph()
    assert len(ag.out_cols) == 103
    # all three state regs are read somewhere
    kinds = [n[0] for n in ag.g.nodes]
    assert kinds.count(AD.STATE) == 12


def test_accum_device_matches_cpp():
    from risc0_tpu.circuit.rv32im import accum_device as AD
    from risc0_tpu.circuit.rv32im.witgen import witgen_accum

    res, mix = _loop_res()
    want = witgen_accum(res, mix)
    got = AD.witgen_accum_np(res, mix)
    mism = np.argwhere(got != want)
    assert mism.size == 0, \
        f"{len(mism)} mismatching cells, first: {mism[:5].tolist()}"


def test_accum_staged_linearity_assumptions():
    """The staged-scan structure (witgen_accum_np): regs 0-1 must be
    JOINTLY ext-linear in (reg0, reg1), and reg 2 affine in itself given
    the true regs 0-1 (its transition includes a reg0 (x) reg1 bilinear
    term in the bigint arm).  Validated with random-state probes."""
    from risc0_tpu.circuit.rv32im import accum_device as AD

    res, mix = _loop_res(count=50)
    ag = AD.accum_graph()
    rows = res["rows"]
    data, glob = res["data"], res["global"]
    one = np.uint32(F.R % F.P)

    def ev(state):
        return AD.eval_graph_np(ag, data, glob, mix, state)[0]

    zero = np.zeros((rows, 12), np.uint32)
    e0 = ev(zero)
    stA = zero.copy(); stA[:, 0] = one
    stB = zero.copy(); stB[:, 4] = one
    eA, eB = ev(stA), ev(stB)

    def reg(e, r):
        return e[4 * r:4 * r + 4].T

    rng = np.random.default_rng(11)
    s01 = F.encode_np(rng.integers(0, F.P, (rows, 2, 4)).astype(np.uint32))
    st = zero.copy()
    st[:, 0:8] = s01.reshape(rows, 8)
    er = ev(st)
    for i in range(2):
        want = F.add_np(reg(e0, i), F.add_np(
            F.ext_mul_np(F.sub_np(reg(eA, i), reg(e0, i)), s01[:, 0]),
            F.ext_mul_np(F.sub_np(reg(eB, i), reg(e0, i)), s01[:, 1])))
        assert np.array_equal(reg(er, i), want), \
            f"regs 0-1 not jointly ext-linear (reg {i})"
    # reg2 affine given s01: E(s01, x) == A2*x + d2
    eC = er  # state (s01, 0)
    stD = st.copy(); stD[:, 8] = one
    eD = ev(stD)
    x = F.encode_np(rng.integers(0, F.P, (rows, 4)).astype(np.uint32))
    stX = st.copy(); stX[:, 8:12] = x
    eX = ev(stX)
    want2 = F.add_np(reg(eC, 2), F.ext_mul_np(
        F.sub_np(reg(eD, 2), reg(eC, 2)), x))
    assert np.array_equal(reg(eX, 2), want2), "reg2 not affine given s01"
    # row 0 never reads the (cyclically wrapped) previous state
    assert (F.sub_np(reg(eA, 0), reg(e0, 0))[0] == 0).all()


def test_accum_device_agrees_with_cpp_on_corrupt_witness():
    """Corrupted data registers: the device path must agree with the C++
    interpreter — reject when it rejects, match bit-exactly when its
    internal EQZ checks happen to accept (the accum pass is not a full
    constraint checker; eval_check is)."""
    from risc0_tpu.circuit.rv32im import accum_device as AD
    from risc0_tpu.circuit.rv32im.witgen import witgen_accum

    res, mix = _loop_res(count=30)
    res = dict(res)
    data = res["data"].copy()
    data[:64, res["rows"] // 2] = 2
    res["data"] = data
    try:
        want = witgen_accum(res, mix)
    except RuntimeError:
        with pytest.raises(RuntimeError, match="failed in-circuit checks"):
            AD.witgen_accum_np(res, mix)
        return
    got = AD.witgen_accum_np(res, mix)
    assert np.array_equal(got, want)


def test_accum_device_flags_inconsistent_onehot():
    """A corruption the interpreter rejects (garbled OneHot selector in
    the final lookup-table region) must be flagged by the device path's
    bad-row accumulator too."""
    from risc0_tpu.circuit.rv32im import accum_device as AD
    from risc0_tpu.circuit.rv32im.witgen import witgen_accum

    res, mix = _loop_res(count=30)
    base = res["data"]
    rows = res["rows"]
    found = None
    rng = np.random.default_rng(5)
    for _ in range(40):
        col = int(rng.integers(0, base.shape[0]))
        row = int(rng.integers(rows // 2, rows))
        trial = dict(res)
        d2 = base.copy()
        d2[col, row] = (int(d2[col, row]) + 1) % F.P
        trial["data"] = d2
        try:
            witgen_accum(trial, mix)
        except RuntimeError:
            found = trial
            break
    if found is None:
        pytest.skip("no single-cell corruption rejected by the C++ oracle")
    with pytest.raises(RuntimeError, match="failed in-circuit checks"):
        AD.witgen_accum_np(found, mix)


def test_accum_device_jnp_matches_cpp():
    """The jitted register-file executor (probe/scan/final pipeline in ONE
    graph) matches the host C++ bit-exactly on a real segment."""
    from risc0_tpu.circuit.rv32im import accum_device as AD
    from risc0_tpu.circuit.rv32im.witgen import witgen_accum

    res, mix = _loop_res()
    want = witgen_accum(res, mix)
    got_m = AD.witgen_accum_device(res, mix)
    got = F.decode_np(np.asarray(got_m))
    mism = np.argwhere(got != want)
    assert mism.size == 0, \
        f"{len(mism)} mismatching cells, first: {mism[:5].tolist()}"


def test_accum_device_commit_root_matches_host_path():
    """prove.py integration: committing the device (Montgomery) accum with
    encode=False must produce the same Merkle root as the host std-form
    accum with encode=True — i.e. the seal is unchanged by the device
    accum path."""
    from risc0_tpu.circuit.rv32im import accum_device as AD
    from risc0_tpu.circuit.rv32im.witgen import witgen_accum
    from risc0_tpu.hal import jnp_hal as hal

    res, mix = _loop_res()
    host = witgen_accum(res, mix)
    dev = AD.witgen_accum_device(res, mix)

    _c1, _e1, layers1 = hal.commit_pipeline(host, encode=True)
    _c2, _e2, layers2 = hal.commit_pipeline(dev, encode=False)
    assert len(layers1) == len(layers2)
    for a, b in zip(layers1, layers2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_accum_device_matches_cpp_bigint_guest():
    """The bigint arm's reg0 (x) reg1 bilinear accumulation (the case
    that breaks a single-register affine scan) must be bit-exact vs the
    C++ interpreter — regression for the staged-scan algorithm."""
    import sys
    sys.path.insert(0, "/root/repo")
    from tests.test_bigint import test_bigint2_guest_executes

    from risc0_tpu.circuit.rv32im import accum_device as AD
    from risc0_tpu.circuit.rv32im.witgen import witgen_accum, witgen_exec

    session = test_bigint2_guest_executes()
    res = witgen_exec(session.segments[0], rand_z=(5, 6, 7, 8))
    mix = np.arange(1, 37, dtype=np.uint32)
    want = witgen_accum(res, mix)
    got = AD.witgen_accum_np(res, mix)
    assert np.array_equal(got, want)


def test_accum_device_jnp_matches_cpp_bigint_guest():
    from tests.test_bigint import test_bigint2_guest_executes

    from risc0_tpu.circuit.rv32im import accum_device as AD
    from risc0_tpu.circuit.rv32im.witgen import witgen_accum, witgen_exec

    session = test_bigint2_guest_executes()
    res = witgen_exec(session.segments[0], rand_z=(5, 6, 7, 8))
    mix = np.arange(1, 37, dtype=np.uint32)
    want = witgen_accum(res, mix)
    got = F.decode_np(np.asarray(AD.witgen_accum_device(res, mix)))
    assert np.array_equal(got, want)
