"""Password-policy example (reference examples/password-checker): the
guest reads a password, enforces the policy IN the zkVM (length >= 8,
at least one digit, at least one letter), and commits only the SHA-256
digest — the verifier learns the password met the policy without seeing
it.  A policy violation halts with a nonzero user exit code.

    python examples/password_checker.py [password]
    RISC0_REAL_PROVE=1 python examples/password_checker.py
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


def build_guest(pw_len: int) -> bytes:
    """Policy loop in rv32im: walk the bytes once, tracking has_digit /
    has_letter flags; reject short passwords up front."""
    g = GuestEnv()
    a = g.a
    msg, out, nblocks = g.sha256_buf(pw_len)
    g.a.syscall("SYS_READ", g._tok("SYS_READ"), msg, pw_len,
                args=[0, pw_len])

    if pw_len < 8:
        g.exit(1)    # too short: constant-fail guest
        return g.link()

    a.li("s1", msg)                   # ptr
    a.li("s2", (msg[0], msg[1] + pw_len))   # end
    a.li("s3", 0)                     # has_digit
    a.li("s4", 0)                     # has_letter
    a.label("loop")
    a.beq("s1", "s2", "done")
    a.lbu("t0", "s1", 0)              # byte
    # digit: '0' <= b <= '9'
    a.addi("t1", "t0", -ord("0"))
    a.li("t2", 10)
    a.sltu("t1", "t1", "t2")          # (b - '0') < 10  (unsigned)
    a.or_("s3", "s3", "t1")
    # letter: lowercase the byte (set bit 0x20), 'a' <= b <= 'z'
    a.li("t2", 0x20)
    a.or_("t1", "t0", "t2")
    a.addi("t1", "t1", -ord("a"))
    a.li("t2", 26)
    a.sltu("t1", "t1", "t2")
    a.or_("s4", "s4", "t1")
    a.addi("s1", "s1", 1)
    a.jal("zero", "loop")
    a.label("done")
    a.and_("t0", "s3", "s4")          # both flags set?
    a.bne("t0", "zero", "ok")
    g.exit(1)
    a.label("ok")
    g.sha256_emit(out, msg, nblocks)
    jbuf, _, _ = g.sha256_buf(32)
    g.copy_words(jbuf, out, 8)
    dig = g.commit(jbuf, 32)
    g.exit(0, dig)
    return g.link()


def main():
    password = sys.argv[1] if len(sys.argv) > 1 else "s3cret-passphrase"
    elf = build_guest(len(password))

    env = ExecutorEnv(segment_po2=16).write_slice(password.encode())
    executor = ExecutorImpl(env, elf)
    image_id = executor.compute_image_id()
    session = executor.run()
    if session.exit_code != ("Halted", 0):
        print(f"password REJECTED by in-guest policy: {session.exit_code}")
        return
    digest = bytes(session.journal)
    assert digest == hashlib.sha256(password.encode()).digest()
    print(f"policy ok; committed digest {digest.hex()[:32]}…")

    real = os.environ.get("RISC0_REAL_PROVE") == "1"
    if not real:
        os.environ["RISC0_DEV_MODE"] = "1"
    prover = get_prover_server(ProverOpts(receipt_kind="composite",
                                          dev_mode=not real))
    info = prover.prove_session(session)
    info.receipt.verify(image_id)
    print(f"receipt verified (kind={info.receipt.inner.kind}): the "
          "password satisfied the policy, and only its hash is public")


if __name__ == "__main__":
    main()
