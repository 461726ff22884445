"""Proof composition example (reference examples/composition): guest A
commits a value; guest B VERIFIES guest A's receipt inside the zkVM
(env::verify_integrity) and commits its own result conditioned on it.
The host adds A's receipt as an assumption; the prover attaches it to
the composite receipt so B's claim is unconditional after resolution.

    python examples/composition.py            # dev-mode (fast)
    RISC0_REAL_PROVE=1 python examples/composition.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", os.environ.get("RISC0_EXAMPLE_PLATFORM",
                                                  "cpu"))

import numpy as np  # noqa: E402

from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl  # noqa: E402
from risc0_tpu.zkvm.guest_env import GuestEnv  # noqa: E402
from risc0_tpu.zkvm.prover import ProverOpts, get_prover_server  # noqa: E402


def build_committer(value: int) -> bytes:
    """Guest A: journal.commit(value) with an in-guest output digest."""
    g = GuestEnv()
    msg, _, _ = g.sha256_buf(4)
    g._patch_data(msg, 0, value.to_bytes(4, "little"))
    dig = g.commit(msg, 4)
    g.exit(0, dig)
    return g.link()


def build_composer() -> bytes:
    """Guest B: read (claim_digest, control_root) of A's receipt, verify
    it as an assumption, then commit the squared input value."""
    g = GuestEnv()
    a = g.a
    args = g.read_slice(68)  # claim(32) || root(32) || value(4)
    g.verify_integrity(args, (args[0], args[1] + 32))
    msg, _, _ = g.sha256_buf(4)
    a.li("t1", (args[0], args[1] + 64))
    a.lw("t2", "t1", 0)
    # value * value via mul (rv32im M-extension)
    from risc0_tpu.zkvm.guest import REG, _r
    a.emit(_r(REG["t3"], REG["t2"], REG["t2"], 0, 1, 0x33))  # mul t3,t2,t2
    a.li("t4", msg)
    a.sw("t4", "t3", 0)
    dig = g.commit(msg, 4)
    g.exit(0, dig)
    return g.link()


def main():
    real = os.environ.get("RISC0_REAL_PROVE") == "1"
    if not real:
        os.environ["RISC0_DEV_MODE"] = "1"
    prover = get_prover_server(ProverOpts(receipt_kind="composite",
                                          dev_mode=not real))

    # 1. prove guest A
    value = 17
    elf_a = build_committer(value)
    exec_a = ExecutorImpl(ExecutorEnv(segment_po2=16), elf_a)
    image_a = exec_a.compute_image_id()
    info_a = prover.prove_session(exec_a.run())
    info_a.receipt.verify(image_a)
    print(f"guest A: committed {value}, receipt verified "
          f"(kind={info_a.receipt.inner.kind})")

    # 2. guest B verifies A's claim in-VM and squares the value
    claim_digest = np.asarray(info_a.receipt.claim().digest(), np.uint32)
    root = np.zeros(8, np.uint32)  # "same verifier context"
    elf_b = build_composer()
    env = (ExecutorEnv(segment_po2=16)
           .write_slice(claim_digest.tobytes() + root.tobytes()
                        + value.to_bytes(4, "little"))
           .add_assumption(info_a.receipt))
    exec_b = ExecutorImpl(env, elf_b)
    image_b = exec_b.compute_image_id()
    session = exec_b.run()
    out = int.from_bytes(bytes(session.journal), "little")
    print(f"guest B: verified A's claim in-VM, committed {out}")
    assert out == value * value

    info_b = prover.prove_session(session)
    info_b.receipt.verify(image_b)
    n_assume = len(getattr(info_b.receipt.inner.value,
                           "assumption_receipts", []))
    print(f"composed receipt verified (kind={info_b.receipt.inner.kind}"
          + (f", {n_assume} assumption receipt attached)" if n_assume
             else ")"))


if __name__ == "__main__":
    main()
