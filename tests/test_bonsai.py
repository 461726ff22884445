"""Bonsai SDK client (reference bonsai/sdk/src/lib.rs) against the REST
proving service."""

import tempfile
import threading
import time

import pytest

from risc0_tpu.zkvm.api_server import serve
from risc0_tpu.zkvm.bonsai import Client, SdkErr


@pytest.fixture(scope="module")
def client():
    srv = serve(port=0, storage=tempfile.mkdtemp())
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    c = Client.from_parts(f"http://127.0.0.1:{srv.server_address[1]}")
    yield c
    srv.shutdown()


def test_from_env(monkeypatch):
    monkeypatch.delenv("BONSAI_API_URL", raising=False)
    with pytest.raises(SdkErr, match="BONSAI_API_URL"):
        Client.from_env()
    monkeypatch.setenv("BONSAI_API_URL", "http://x:1")
    assert Client.from_env().url == "http://x:1"


def test_version_and_quotas(client):
    assert "compat_risc0" in client.get_version()
    assert client.quotas()["concurrent_proofs"] >= 1


def test_image_dedup_and_prove_flow(client):
    elf = open("guests/loop.bin", "rb").read()
    assert client.upload_img("loop-img", elf) is False
    assert client.upload_img("loop-img", elf) is True  # dedup

    input_id = client.upload_input((10).to_bytes(4, "little"))
    session = client.create_session("loop-img", input_id)
    while (res := session.status(client))["status"] == "RUNNING":
        time.sleep(0.1)
    assert res["status"] == "SUCCEEDED"
    assert res["stats"]["segments"] == 1
    receipt = client.download(res["receipt_url"])
    assert len(receipt) > 0
    assert "SUCCEEDED" in session.logs(client)


def test_exec_only_journal_and_stop(client):
    elf = open("guests/loop.bin", "rb").read()
    client.upload_img("loop-img2", elf)
    input_id = client.upload_input((7).to_bytes(4, "little"))
    session = client.create_session("loop-img2", input_id,
                                    execute_only=True)
    while (res := session.status(client))["status"] == "RUNNING":
        time.sleep(0.1)
    assert res["status"] == "SUCCEEDED"
    assert isinstance(session.exec_only_journal(client), bytes)
    session.stop(client)  # no-op on a finished job


def test_snark_create_surfaces_server_reply(client):
    with pytest.raises(SdkErr, match="501"):
        client.create_snark("whatever")
