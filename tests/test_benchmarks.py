"""Guest benchmark matrix (reference benchmarks/src/lib.rs): every
authored guest executes cleanly and reports Metrics."""

import sys

sys.path.insert(0, "scripts")


def test_benchmark_guests_execute():
    import benchmarks as B

    for name in ("fib", "memcpy", "bigint", "keccak", "sha2-iter"):
        m = B.run_one(name, prove=False, po2=16)
        assert m["exit"] == "Halted", (name, m)
        assert m["user_cycles"] > 100
        assert m["speed_hz"] > 0


def test_sha2_iter_guest_matches_hashlib():
    """The SHA-accelerator chain (guest v1 ecall -> v1compat kernel ->
    machine SHA2 ecall) computes real SHA-256: 25 iterated rounds equal
    the hashlib model byte-for-byte."""
    import io

    import benchmarks as B
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

    out = io.BytesIO()
    env = ExecutorEnv(segment_po2=16, write_fds={1: out})
    session = ExecutorImpl(env, B.guest_sha2_iter(25)).run()
    assert session.exit_code[0] == "Halted"
    assert out.getvalue() == B.sha2_iter_expected(25)
