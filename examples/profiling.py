"""Guest profiling example (reference examples/profiling): run the loop
guest with the cycle profiler enabled and write a pprof protobuf.

    python examples/profiling.py /tmp/guest.pb
    # inspect with: go tool pprof -top /tmp/guest.pb
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl  # noqa: E402


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/guest.pb"
    elf = open("guests/loop.bin", "rb").read()
    env = ExecutorEnv(segment_po2=16).write_slice(
        (20000).to_bytes(4, "little")).enable_profiler()
    session = ExecutorImpl(env, elf).run()

    prof = env.profiler
    print(f"{session.user_cycles} user cycles profiled "
          f"({prof.total_cycles()} attributed)")
    for name, cycles in prof.top_functions(10):
        print(f"  {cycles:>10}  {name}")
    with open(out, "wb") as f:
        f.write(prof.encode_to_vec())
    print(f"pprof profile written to {out}")


if __name__ == "__main__":
    main()
