"""Pro-rata allocation example (reference examples/prorata): the guest
computes each recipient's share of an airdrop — allocation =
amount * balance / total_supply — inside the zkVM and commits
(recipient_id, allocation) to the journal, so the distribution math is
publicly verifiable without re-running it.  The guest checks the 32-bit
product does not overflow (mulhu must be zero) and halts with exit 1
otherwise.

    python examples/prorata.py [amount balance total]
    RISC0_REAL_PROVE=1 python examples/prorata.py
"""

import os
import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", os.environ.get("RISC0_EXAMPLE_PLATFORM",
                                                  "cpu"))

from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl  # noqa: E402
from risc0_tpu.zkvm.guest_env import GuestEnv  # noqa: E402
from risc0_tpu.zkvm.prover import ProverOpts, get_prover_server  # noqa: E402


def build_guest() -> bytes:
    """stdin: recipient_id, amount, balance, total (4 u32 LE words).
    journal: recipient_id, allocation (2 u32 words)."""
    g = GuestEnv()
    a = g.a
    inp = g.read_slice(16)
    out = a.put_data(b"\0" * 8)

    a.li("s1", inp)
    a.lw("a0", "s1", 0)               # recipient id
    a.lw("t0", "s1", 4)               # amount
    a.lw("t1", "s1", 8)               # balance
    a.lw("t2", "s1", 12)              # total supply
    # refuse a zero denominator or a 64-bit product (no silent wrap)
    a.beq("t2", "zero", "bad")
    a.mulhu("t3", "t0", "t1")
    a.bne("t3", "zero", "bad")
    a.mul("t3", "t0", "t1")
    a.divu("t4", "t3", "t2")          # allocation
    a.li("s2", out)
    a.sw("s2", "a0", 0)
    a.sw("s2", "t4", 4)
    jdig = g.commit(out, 8)
    g.exit(0, jdig)
    a.label("bad")
    g.exit(1)
    return g.link()


def main():
    amount, balance, total = ((int(x) for x in sys.argv[1:4])
                              if len(sys.argv) >= 4 else (50_000, 137, 10_000))
    recipient = 0xA11CE
    elf = build_guest()

    env = ExecutorEnv(segment_po2=16).write_slice(
        struct.pack("<IIII", recipient, amount, balance, total))
    executor = ExecutorImpl(env, elf)
    image_id = executor.compute_image_id()
    session = executor.run()
    if session.exit_code != ("Halted", 0):
        print(f"guest rejected the inputs: {session.exit_code}")
        return
    rid, alloc = struct.unpack("<II", bytes(session.journal))
    assert rid == recipient and alloc == amount * balance // total
    print(f"recipient {rid:#x}: allocation {alloc} "
          f"(= {amount} * {balance} / {total})")

    real = os.environ.get("RISC0_REAL_PROVE") == "1"
    if not real:
        os.environ["RISC0_DEV_MODE"] = "1"
    prover = get_prover_server(ProverOpts(receipt_kind="composite",
                                          dev_mode=not real))
    info = prover.prove_session(session)
    info.receipt.verify(image_id)
    print(f"receipt verified (kind={info.receipt.inner.kind}); the journal "
          "binds the allocation to the public distribution math")


if __name__ == "__main__":
    main()
