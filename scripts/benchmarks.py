"""Guest benchmark matrix (reference benchmarks/src/lib.rs Metrics:
speed Hz, exec/prove/verify durations, total & user cycles, seal bytes).

Guests are authored with the framework's rv32im assembler (zkvm/guest.py)
plus the reference's prebuilt loop guest:

  * loop      — prebuilt ALU loop (the datasheet guest)
  * fib       — authored fibonacci iteration
  * memcpy    — authored load/store sweep
  * bigint    — authored modmul_256 accelerator calls (ECDSA kernel op)
  * keccak    — authored sys_keccak permutations (coprocessor path)

    python scripts/benchmarks.py                  # execute-only metrics
    python scripts/benchmarks.py --prove --po2 16 # + prove/verify timings
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

NR = "risc0_zkvm_platform::syscall::nr::"


def _tok(a, short):
    return a.put_data((NR + short).encode() + b"\0")


def guest_fib(n: int) -> bytes:
    """Iterative fibonacci: n rounds of (a, b) = (b, a+b)."""
    from risc0_tpu.zkvm.guest import Asm

    a = Asm()
    a.li("s0", 1)
    a.li("s1", 1)
    a.li("t0", n)
    a.label("loop")
    a.add("t1", "s0", "s1")
    a.add("s0", "s1", "zero")
    a.add("s1", "t1", "zero")
    a.addi("t0", "t0", -1)
    a.bne("t0", "zero", "loop")
    a.halt(0)
    return a.link()


def guest_memcpy(words: int, rounds: int) -> bytes:
    """Copy a buffer word by word, `rounds` times."""
    from risc0_tpu.zkvm.guest import Asm

    a = Asm()
    src = a.put_data(bytes(range(256)) * (words * 4 // 256 + 1), align=16)
    dst = a.put_data(b"\0" * words * 4, align=16)
    a.li("t2", rounds)
    a.label("round")
    a.li("a0", src)
    a.li("a1", dst)
    a.li("t0", words)
    a.label("copy")
    a.lw("t1", "a0", 0)
    a.sw("a1", "t1", 0)
    a.addi("a0", "a0", 4)
    a.addi("a1", "a1", 4)
    a.addi("t0", "t0", -1)
    a.bne("t0", "zero", "copy")
    a.addi("t2", "t2", -1)
    a.bne("t2", "zero", "round")
    a.halt(0)
    return a.link()


def guest_bigint(rounds: int) -> bytes:
    """modmul_256 accelerator calls in a loop (the EC/RSA kernel op)."""
    from risc0_tpu.zkvm.bigint2 import _DATA
    from risc0_tpu.zkvm.guest import Asm

    blob = open(f"{_DATA}/field/modmul_256.blob", "rb").read()
    hdr = np.frombuffer(blob[:16], np.uint32)
    M = (1 << 255) - 19
    a = Asm()
    blob_t = a.put_data(blob, align=16)
    a_t = a.put_data((12345).to_bytes(32, "little"), align=16)
    m_t = a.put_data(M.to_bytes(32, "little"), align=16)
    r_t = a.put_data(b"\0" * 32, align=16)
    a.li("sp", 0x200400)
    a.li("s2", rounds)
    a.label("round")
    a.li("t0", 6)
    a.li("a0", blob_t)
    a.addi("t1", "a0", 16)
    a.li("t4", int(hdr[0]) * 4)
    a.add("t2", "t1", "t4")
    a.li("t4", int(hdr[1]) * 4)
    a.add("t3", "t2", "t4")
    a.li("a1", a_t)
    a.li("a2", a_t)
    a.li("a3", m_t)
    a.li("a4", r_t)
    a.li("t5", int(hdr[3]) * 4)
    a.sub("sp", "sp", "t5")
    a.ecall()
    a.li("t5", int(hdr[3]) * 4)
    a.add("sp", "sp", "t5")
    a.addi("s2", "s2", -1)
    a.bne("s2", "zero", "round")
    a.halt(0)
    return a.link()


SHA256_IV = bytes.fromhex(
    "6a09e667bb67ae853c6ef372a54ff53a510e527f9b05688c1f83d9ab5be0cd19")


def sha2_iter_expected(iters: int) -> bytes:
    """Host model of guest_sha2_iter: digest_{i+1} = sha256(digest_i)."""
    import hashlib

    d = b"\0" * 32
    for _ in range(iters):
        d = hashlib.sha256(d).digest()
    return d


def guest_sha2_iter(iters: int) -> bytes:
    """Iterated SHA-256 over the previous digest via the SHA accelerator
    ecall (v1 ABI t0=3 -> v1compat kernel -> machine SHA2 ecall; reference
    benchmarks/methods/guest/src/bin/iter_sha2.rs semantics).

    Each round compresses one padded 64-byte block (32 digest bytes +
    0x80 + zeros + bit length 256) from the standard IV, then copies the
    output state into the block for the next round."""
    from risc0_tpu.zkvm.guest import Asm

    a = Asm()
    # block: digest (8 words) ++ SHA padding for a 32-byte message
    pad = b"\x80" + b"\0" * 29 + (256).to_bytes(2, "big")
    block = a.put_data(b"\0" * 32 + pad, align=8)
    iv = a.put_data(SHA256_IV, align=8)
    out = a.put_data(b"\0" * 32, align=8)
    wtok = _tok(a, "SYS_WRITE")
    a.li("s2", iters)
    a.label("round")
    a.li("t0", 3)              # v1 ecall table: sha
    a.li("a0", out)            # out_state
    a.li("a1", iv)             # in_state (fresh IV per round)
    a.li("a2", block)          # block1
    a.li("a3", (block[0], block[1] + 32))   # block2 (contiguous)
    a.li("a4", 1)              # one 64-byte block
    a.ecall()
    for i in range(8):         # digest -> block for the next round
        a.lw("t1", "a0", 4 * i)
        a.sw("a2", "t1", 4 * i)
    a.addi("s2", "s2", -1)
    a.bne("s2", "zero", "round")
    # emit the final digest to stdout so hosts can check vs hashlib
    a.syscall("SYS_WRITE", wtok, 0, 0, args=[1, out, 32])
    a.halt(0)
    return a.link()


def guest_keccak(rounds: int) -> bytes:
    """sys_keccak PERMUTE calls (coprocessor batching path)."""
    from risc0_tpu.zkvm.guest import Asm

    a = Asm()
    tok = _tok(a, "SYS_KECCAK")
    state = a.put_data(b"\x07" * 200, align=8)
    a.li("s2", rounds)
    a.label("round")
    # mode=0 (permute), state ptr in/out
    a.syscall("SYS_KECCAK", tok, state, 50, args=[0, state, state])
    a.addi("s2", "s2", -1)
    a.bne("s2", "zero", "round")
    a.halt(0)
    return a.link()


GUESTS = {
    "loop": lambda: (open("/root/repo/guests/loop.bin", "rb").read(),
                     (30000).to_bytes(4, "little")),
    "fib": lambda: (guest_fib(20000), b""),
    "memcpy": lambda: (guest_memcpy(1024, 20), b""),
    "bigint": lambda: (guest_bigint(50), b""),
    "keccak": lambda: (guest_keccak(20), b""),
    "sha2-iter": lambda: (guest_sha2_iter(500), b""),
}


def run_one(name: str, prove: bool, po2: int) -> dict:
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

    elf, input_data = GUESTS[name]()
    env = ExecutorEnv(segment_po2=po2).write_slice(input_data)
    t0 = time.perf_counter()
    session = ExecutorImpl(env, elf).run()
    texec = time.perf_counter() - t0
    m = {
        "name": name,
        "exec_duration_s": round(texec, 4),
        "speed_hz": round(session.user_cycles / texec),
        "user_cycles": session.user_cycles,
        "total_cycles": session.total_cycles,
        "segments": len(session.segments),
        "exit": session.exit_code[0],
    }
    if prove:
        from risc0_tpu.circuit.rv32im.prove import prove_segment
        from risc0_tpu.circuit.rv32im.verify import verify_rv32im_seal

        t0 = time.perf_counter()
        seal = prove_segment(session.segments[0])
        m["prove_duration_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        verify_rv32im_seal(seal)
        m["verify_duration_s"] = round(time.perf_counter() - t0, 2)
        m["seal_bytes"] = len(seal) * 4
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--guests", default=",".join(GUESTS))
    ap.add_argument("--prove", action="store_true")
    ap.add_argument("--po2", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="benchmarks.json")
    a = ap.parse_args()

    import jax
    if a.cpu or not a.prove:
        jax.config.update("jax_platforms", "cpu")

    rows = [run_one(n, a.prove, a.po2) for n in a.guests.split(",")]
    for r in rows:
        extra = f"  prove {r['prove_duration_s']}s" if a.prove else ""
        print(f"  {r['name']:<8} {r['speed_hz']/1e6:6.1f} MHz exec  "
              f"{r['user_cycles']:>10,} cycles  {r['segments']} seg{extra}")
    with open(a.out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"written to {a.out}")


if __name__ == "__main__":
    main()
