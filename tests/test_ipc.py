"""Protobuf-over-TCP prover IPC (reference host/api/{server,client}.rs +
protos/api.proto): framed protobuf envelopes, asset channel, execute
callback stream, dev-mode prove round-trip, error replies."""

import numpy as np
import pytest

from risc0_tpu.zkvm import proto
from risc0_tpu.zkvm.exec import ExecutorEnv
from risc0_tpu.zkvm.ipc import ApiClient, asset_decode, asset_encode
from risc0_tpu.zkvm.prover import DevModeProver, ProverOpts

LOOP = "guests/loop.bin"


@pytest.fixture(scope="module")
def loop_elf():
    return open(LOOP, "rb").read()


@pytest.fixture()
def client():
    c = ApiClient(spawn=True, prover=DevModeProver())
    yield c
    c.close()


def test_proto_roundtrip():
    msg = (proto.uint(1, 300) + proto.bytes_field(2, b"abc") +
           proto.string(3, "xyz") + proto.packed(4, [1, 128, 300000]))
    d = proto.to_dict(msg)
    assert d[1] == 300 and d[2] == b"abc" and d[3] == b"xyz"
    assert proto.unpack_varints(d[4]) == [1, 128, 300000]


def test_asset_roundtrip(tmp_path):
    obj = {"x": np.arange(5), "y": b"bytes"}
    got = asset_decode(asset_encode(obj))
    assert np.array_equal(got["x"], obj["x"]) and got["y"] == b"bytes"
    # path asset
    import pickle

    from risc0_tpu.zkvm.ipc import asset_path

    p = tmp_path / "a.bin"
    p.write_bytes(pickle.dumps([1, 2, 3]))
    assert asset_decode(asset_path(str(p))) == [1, 2, 3]


def test_execute_streams_segments(client, loop_elf):
    env = ExecutorEnv(segment_po2=16).write_slice((10).to_bytes(4, "little"))
    session, segments = client.execute(env, loop_elf)
    assert len(segments) == len(session.segments) == 1
    assert session.exit_code[0] == "Halted"
    assert segments[0].po2 == session.segments[0].po2


def test_prove_dev_mode_roundtrip(client, loop_elf, monkeypatch):
    monkeypatch.setenv("RISC0_DEV_MODE", "1")
    env = ExecutorEnv(segment_po2=16).write_slice((10).to_bytes(4, "little"))
    receipt = client.prove(env, loop_elf,
                           ProverOpts(receipt_kind="composite",
                                      dev_mode=True))
    assert receipt.inner.kind == "fake"
    # verify over the wire too
    from risc0_tpu.zkvm.exec import ExecutorImpl

    image_id = ExecutorImpl(env, loop_elf).compute_image_id()
    client.verify(receipt, image_id)


def test_lift_join_resolve_union_over_wire(client, loop_elf):
    env = ExecutorEnv(segment_po2=16).write_slice((10).to_bytes(4, "little"))
    session, segments = client.execute(env, loop_elf)
    from risc0_tpu.zkvm.claims import ExitCode
    from risc0_tpu.zkvm.receipt import segment_claim, session_claim

    claim = session_claim(session)
    sc = segment_claim(session.segments[0], True, ExitCode("Halted", 0),
                       claim.output)
    sr = client.prove_segment(session.segments[0], sc)
    lifted = client.lift(sr)
    joined = client.join(lifted, lifted)
    assert np.array_equal(joined.claim.pre.digest(),
                          lifted.claim.pre.digest())
    unioned = client.union(lifted, lifted)
    from risc0_tpu.zkvm.claims import UnionClaim

    assert isinstance(unioned.claim, UnionClaim)


def test_server_error_reply(client):
    env = ExecutorEnv(segment_po2=16)
    with pytest.raises(RuntimeError, match="server error"):
        client.prove(env, b"not an elf")


def test_ipc_prover_via_default_prover(monkeypatch, loop_elf):
    """RISC0_PROVER=ipc routes default_prover() through the protobuf
    socket protocol end-to-end (dev-mode receipts)."""
    monkeypatch.setenv("RISC0_DEV_MODE", "1")
    monkeypatch.setenv("RISC0_PROVER", "ipc")
    from risc0_tpu.zkvm import client

    p = client.default_prover()
    assert isinstance(p, client.IpcProver)
    env = ExecutorEnv(segment_po2=16).write_slice((10).to_bytes(4, "little"))
    info = p.prove(env, loop_elf)
    assert info.receipt.inner.kind == "fake"
    p.close()


def test_subprocess_server_roundtrip(loop_elf):
    """`r0vm --port`-style: spawn the CLI server as a child process that
    connects back to the client listener (reference api/client.rs:54-90)."""
    c = ApiClient(subprocess_server=True)
    try:
        env = ExecutorEnv(segment_po2=16).write_slice(
            (10).to_bytes(4, "little"))
        session, segments = c.execute(env, loop_elf)
        assert session.exit_code[0] == "Halted" and len(segments) == 1
    finally:
        c.close()


def test_prove_keccak_over_wire(client):
    """ProveKeccakRequest round-trip (api.proto:63-81) in dev mode."""
    claim = np.arange(8, dtype=np.uint32)
    receipt = client.prove_keccak(claim, 14, np.zeros(8, np.uint32), [])
    assert np.array_equal(np.asarray(receipt.claim.digest(), np.uint32),
                          claim)
