"""Remote-proving example (reference bonsai-sdk usage + examples/prover):
upload a guest image and input to a Bonsai-compatible REST proving
service, poll the STARK session to completion, and download the receipt.
The service here is the in-repo api_server started in-process; point
BONSAI_API_URL at any deployed instance instead.

    python examples/bonsai_remote.py
"""

import os
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", os.environ.get("RISC0_EXAMPLE_PLATFORM",
                                                  "cpu"))
os.environ.setdefault("RISC0_DEV_MODE", "1")

from risc0_tpu.zkvm.api_server import serve  # noqa: E402
from risc0_tpu.zkvm.bonsai import Client  # noqa: E402


def main():
    url = os.environ.get("BONSAI_API_URL")
    srv = None
    if not url:
        srv = serve(port=0, storage=tempfile.mkdtemp())
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        print(f"started local proving service at {url}")
    client = Client.from_parts(url)

    elf = open(Path(__file__).resolve().parent.parent / "guests" /
               "loop.bin", "rb").read()
    client.upload_img("loop-img", elf)
    input_id = client.upload_input((42).to_bytes(4, "little"))
    print(f"uploaded image + input ({input_id})")

    session = client.create_session("loop-img", input_id)
    while (res := session.status(client))["status"] == "RUNNING":
        time.sleep(0.2)
    if res["status"] != "SUCCEEDED":
        raise SystemExit(f"proving failed: {res}")
    print(f"session {session.uuid}: {res['stats']}")
    receipt = client.download(res["receipt_url"])
    print(f"downloaded receipt: {len(receipt)} bytes")
    if srv is not None:
        srv.shutdown()


if __name__ == "__main__":
    main()
