"""Hello-world example (reference examples/hello-world): author a guest
that commits a message to the journal, execute it, prove it (dev-mode by
default; set RISC0_REAL_PROVE=1 for the cryptographic prover), and verify
the receipt against the image ID.

    python examples/hello_world.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", os.environ.get("RISC0_EXAMPLE_PLATFORM",
                                                  "cpu"))

from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl  # noqa: E402
from risc0_tpu.zkvm.guest import Asm, output_digest  # noqa: E402
from risc0_tpu.zkvm.prover import ProverOpts, get_prover_server  # noqa: E402

NR = "risc0_zkvm_platform::syscall::nr::"


def build_guest(message: bytes) -> bytes:
    """Guest: journal.commit(message); env::exit(0)."""
    a = Asm()
    write_tok = a.put_data((NR + "SYS_WRITE").encode() + b"\0")
    jdata = a.put_data(message)
    odig = a.put_data(output_digest(message))
    a.syscall("SYS_WRITE", write_tok, 0, 0, args=[3, jdata, len(message)])
    a.halt(user_exit=0, out_digest_token=odig)
    return a.link()


def main():
    message = b"Hello, world! (proved on a TPU framework)"
    elf = build_guest(message)

    env = ExecutorEnv(segment_po2=16)
    executor = ExecutorImpl(env, elf)
    image_id = executor.compute_image_id()
    session = executor.run()
    print(f"executed: {session.user_cycles} user cycles, "
          f"journal = {bytes(session.journal)!r}")

    real = os.environ.get("RISC0_REAL_PROVE") == "1"
    if not real:
        os.environ["RISC0_DEV_MODE"] = "1"
    prover = get_prover_server(ProverOpts(receipt_kind="composite",
                                          dev_mode=not real))
    info = prover.prove_session(session)
    info.receipt.verify(image_id)
    print(f"receipt kind = {info.receipt.inner.kind}; verified against "
          f"image id")


if __name__ == "__main__":
    main()
