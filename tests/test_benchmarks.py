"""Guest benchmark matrix (reference benchmarks/src/lib.rs): every
authored guest executes cleanly and reports Metrics."""

import sys

sys.path.insert(0, "scripts")


def test_benchmark_guests_execute():
    import benchmarks as B

    for name in ("fib", "memcpy", "bigint", "keccak"):
        m = B.run_one(name, prove=False, po2=16)
        assert m["exit"] == "Halted", (name, m)
        assert m["user_cycles"] > 100
        assert m["speed_hz"] > 0
