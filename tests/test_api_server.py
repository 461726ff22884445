"""REST API tests (reference r0vm/src/api.rs test shape: client + server
in-process over a socket)."""

import json
import tempfile
import threading
import urllib.request

import pytest

from risc0_tpu.zkvm.api_server import serve

LOOP = "/root/repo/guests/loop.bin"


@pytest.fixture(scope="module")
def server():
    tmp = tempfile.mkdtemp()
    srv = serve(port=0, storage=tmp)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _req(url, method="GET", data=None):
    req = urllib.request.Request(url, data=data, method=method)
    with urllib.request.urlopen(req) as r:
        body = r.read()
    try:
        return json.loads(body)
    except ValueError:
        return body


def test_full_proving_flow(server):
    import time

    elf = open(LOOP, "rb").read()
    # upload image + input
    _req(f"{server}/images/upload/loop", "PUT", elf)
    up = _req(f"{server}/inputs/upload")
    _req(f"{server}{up['url']}", "PUT", (25).to_bytes(4, "little"))
    # create session
    res = _req(f"{server}/sessions/create", "POST", json.dumps({
        "img": "loop", "input": up["uuid"]}).encode())
    job = res["uuid"]
    for _ in range(100):
        st = _req(f"{server}/sessions/status/{job}")
        if st["status"] != "RUNNING":
            break
        time.sleep(0.1)
    assert st["status"] == "SUCCEEDED", st
    assert st["stats"]["segments"] == 1
    receipt = _req(f"{server}{st['receipt_url']}")
    assert receipt  # pickled dev-mode receipt blob


def test_unknown_job_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(f"{server}/sessions/status/nope")
    assert e.value.code == 404


def test_failed_job_reports_error(server):
    res = _req(f"{server}/sessions/create", "POST", json.dumps({
        "img": "missing", "input": "missing"}).encode())
    import time

    for _ in range(50):
        st = _req(f"{server}/sessions/status/{res['uuid']}")
        if st["status"] != "RUNNING":
            break
        time.sleep(0.1)
    assert st["status"] == "FAILED"
    assert "error_msg" in st
