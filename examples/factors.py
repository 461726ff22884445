"""Factors example (reference examples/factors/methods/guest/src/main.rs):
the guest reads two secret factors, asserts both are nontrivial, and
commits only their product — the receipt proves "I know a factorization
of n" without revealing the factors.  The multiply runs as a 64-bit
product (mul + mulhu) so claimed factors can't wrap around 2^32.

    python examples/factors.py [a] [b]
    RISC0_REAL_PROVE=1 python examples/factors.py   # real composite prove
"""

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


def build_guest() -> bytes:
    """Guest: read (a, b) as u32 words; require a > 1 and b > 1; commit
    the u64 product a*b to the journal."""
    g = GuestEnv()
    a = g.a
    a.li("sp", 0x200400)
    inp = g.read_slice(8)

    a.li("t3", inp)
    a.lw("s2", "t3", 0)   # a
    a.lw("s3", "t3", 4)   # b
    # nontrivial factors: a > 1 and b > 1  (unsigned: fail if x < 2)
    a.li("t4", 2)
    a.sltu("t5", "s2", "t4")
    a.bne("t5", "zero", "fail")
    a.sltu("t5", "s3", "t4")
    a.bne("t5", "zero", "fail")

    # n = a * b as u64 (lo via mul, hi via mulhu)
    prod = a.put_data(b"\0" * 8, align=8)
    a.li("t3", prod)
    a.mul("t4", "s2", "s3")
    a.sw("t3", "t4", 0)
    a.mulhu("t4", "s2", "s3")
    a.sw("t3", "t4", 4)

    dig = g.commit(prod, 8)
    g.exit(0, dig)
    a.label("fail")
    g.exit(1)
    return g.link()


def main():
    fa = int(sys.argv[1]) if len(sys.argv) > 1 else 3141592653
    fb = int(sys.argv[2]) if len(sys.argv) > 2 else 2718281829
    elf = build_guest()

    env = ExecutorEnv(segment_po2=16).write_slice(
        fa.to_bytes(4, "little") + fb.to_bytes(4, "little"))
    executor = ExecutorImpl(env, elf)
    image_id = executor.compute_image_id()
    session = executor.run()
    assert session.exit_code == ("Halted", 0), session.exit_code
    n = int.from_bytes(bytes(session.journal), "little")
    assert n == fa * fb
    print(f"journal: n = {n} (factors stay private)")

    # trivial factorizations are rejected in-guest
    bad = ExecutorImpl(
        ExecutorEnv(segment_po2=16).write_slice(
            (1).to_bytes(4, "little") + fb.to_bytes(4, "little")),
        elf).run()
    assert bad.exit_code == ("Halted", 1)
    print("guest rejected a trivial factor (a = 1)")

    real = os.environ.get("RISC0_REAL_PROVE") == "1"
    if not real:
        os.environ["RISC0_DEV_MODE"] = "1"
    prover = get_prover_server(ProverOpts(receipt_kind="composite",
                                          dev_mode=not real))
    info = prover.prove_session(session)
    info.receipt.verify(image_id)
    print(f"receipt verified (kind={info.receipt.inner.kind}); journal "
          f"binds n = {n}")


if __name__ == "__main__":
    main()
