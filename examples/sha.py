"""SHA-256 example (reference examples/sha): the guest hashes a message
with the SHA-256 accelerator ecall and commits the digest to the
journal; the host verifies the receipt and checks the digest against
hashlib.

    python examples/sha.py [message]
"""

import hashlib
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", os.environ.get("RISC0_EXAMPLE_PLATFORM",
                                                  "cpu"))

from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl  # noqa: E402
from risc0_tpu.zkvm.guest_env import GuestEnv  # noqa: E402
from risc0_tpu.zkvm.prover import ProverOpts, get_prover_server  # noqa: E402


def build_guest(msg_len: int) -> bytes:
    """Guest: read msg_len bytes, digest = sha256(msg) via the
    accelerator, journal.commit(digest)."""
    g = GuestEnv()
    msg, out, nblocks = g.sha256_buf(msg_len)
    # read the message straight into the padded hash buffer
    g.a.syscall("SYS_READ", g._tok("SYS_READ"), msg, msg_len,
                args=[0, msg_len])
    g.sha256_emit(out, msg, nblocks)
    jbuf, _, _ = g.sha256_buf(32)
    g.copy_words(jbuf, out, 8)
    dig = g.commit(jbuf, 32)
    g.exit(0, dig)
    return g.link()


def main():
    message = (sys.argv[1] if len(sys.argv) > 1
               else "proving hashes on the MXU's watch").encode()
    elf = build_guest(len(message))

    env = ExecutorEnv(segment_po2=16).write_slice(message)
    executor = ExecutorImpl(env, elf)
    image_id = executor.compute_image_id()
    session = executor.run()
    digest = bytes(session.journal)
    print(f"guest digest: {digest.hex()}")
    assert digest == hashlib.sha256(message).digest(), "digest mismatch"

    real = os.environ.get("RISC0_REAL_PROVE") == "1"
    if not real:
        os.environ["RISC0_DEV_MODE"] = "1"
    prover = get_prover_server(ProverOpts(receipt_kind="composite",
                                          dev_mode=not real))
    info = prover.prove_session(session)
    info.receipt.verify(image_id)
    print(f"receipt verified (kind={info.receipt.inner.kind}); journal "
          f"binds sha256({message!r})")


if __name__ == "__main__":
    main()
