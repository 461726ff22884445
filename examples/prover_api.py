"""External-prover API example (reference examples/prover, ApiClient
usage): the host process talks to an r0vm-style prover SERVER over the
length-framed IPC protocol instead of proving in-process — execute for
the journal first, then prove.  The server here is spawned in-process
(spawn=True); `r0vm serve --port` exposes the same protocol over TCP
(see zkvm/ipc.py).

    python examples/prover_api.py
    RISC0_REAL_PROVE=1 python examples/prover_api.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", os.environ.get("RISC0_EXAMPLE_PLATFORM",
                                                  "cpu"))

from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl  # noqa: E402
from risc0_tpu.zkvm.ipc import ApiClient  # noqa: E402
from risc0_tpu.zkvm.prover import (DevModeProver, ProverImpl,  # noqa: E402
                                   ProverOpts)


def main():
    real = os.environ.get("RISC0_REAL_PROVE") == "1"
    if not real:
        os.environ["RISC0_DEV_MODE"] = "1"

    elf = open(Path(__file__).resolve().parent.parent / "guests" /
               "loop.bin", "rb").read()
    env = ExecutorEnv(segment_po2=16).write_slice((25).to_bytes(4,
                                                                "little"))
    image_id = ExecutorImpl(env, elf).compute_image_id()

    client = ApiClient(spawn=True,
                       prover=ProverImpl() if real else DevModeProver())
    try:
        session, segments = client.execute(env, elf)
        print(f"execute: {getattr(session, 'user_cycles', '?')} user "
              f"cycles, {len(segments)} segment(s)")

        info = client.prove(env, elf,
                            ProverOpts(receipt_kind="composite",
                                       dev_mode=not real))
        receipt = info.receipt if hasattr(info, "receipt") else info
        receipt.verify(image_id)
        print(f"prove over IPC ok (kind={receipt.inner.kind}); receipt "
              "verified locally against the image id")
    finally:
        client.close()


if __name__ == "__main__":
    main()
