"""Content-addressed asset store (parallel/assets.py): wire protocol,
integrity checks, local-cache short-circuit, and segment shipping by
reference through resolve_segment."""

import numpy as np
import pytest

from risc0_tpu.parallel.assets import (AssetClient, AssetRef, AssetServer,
                                       AssetStore, SegmentAssetRef,
                                       digest_of)


@pytest.fixture()
def server():
    srv = AssetServer(AssetStore())
    yield srv
    srv.close()


def test_store_roundtrip_memory_and_disk(tmp_path):
    for store in (AssetStore(), AssetStore(str(tmp_path))):
        data = b"segment-bytes" * 1000
        d = store.put(data)
        assert d == digest_of(data)
        assert store.has(d)
        assert store.get(d) == data
        assert store.get("00" * 32) is None
        assert not store.has("11" * 32)


def test_client_put_get_has_missing(server):
    client = AssetClient(server.addr)
    data = b"x" * (1 << 20)  # 1 MB frame
    d = client.put(data)
    assert client.has(d)
    assert client.get(d) == data
    assert not client.has("22" * 32)
    with pytest.raises(KeyError):
        client.get("22" * 32)
    client.close()


def test_server_rejects_digest_mismatch(server):
    import socket
    import struct

    sock = socket.create_connection(server.addr)
    payload = b"hello"
    sock.sendall(bytes([2]) + b"\0" * 32
                 + struct.pack("<Q", len(payload)) + payload)
    status = sock.recv(9)
    assert status[0] == 1  # rejected
    sock.close()


def test_asset_ref_fetches_over_wire_and_caches(server):
    """A ref built without populating the local cache exercises the TCP
    fetch; the second resolve hits the cache (server can be gone)."""
    client = AssetClient(server.addr)
    data = np.arange(4096, dtype=np.uint32).tobytes()
    d = client.put(data)
    ref = AssetRef(digest=d, size=len(data), addr=server.addr)
    assert ref.resolve() == data
    server.close()
    assert ref.resolve() == data  # local cache, no round-trip


def test_segment_asset_ref_through_resolve_segment(server):
    """Ship a real executed segment by reference and prove-path-resolve it
    on the 'remote' side (resolve_segment duck type)."""
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl, resolve_segment

    elf = open("/root/repo/guests/loop.bin", "rb").read()
    env = ExecutorEnv(segment_po2=15).write_slice((5).to_bytes(4, "little"))
    seg = ExecutorImpl(env, elf).run().segments[0]

    seg_ref, client = SegmentAssetRef.store(seg, server.addr)
    assert seg_ref.po2 == seg.po2 and seg_ref.index == seg.index

    # simulate a remote host: wipe the process-local cache
    import risc0_tpu.parallel.assets as assets_mod
    assets_mod._local = AssetStore()

    got = resolve_segment(seg_ref)
    assert np.array_equal(got.pre_digest, seg.pre_digest)
    assert np.array_equal(got.post_digest, seg.post_digest)
    assert got.pages.keys() == seg.pages.keys()
    client.close()
