"""Cluster deployment example (reference r0vm actor cluster +
testdata/default.toml): launch an executor + prover pool from a TOML
config and push a multi-segment proof job through the DAG
(execute -> prove -> lift -> join tree -> resolve).

    python examples/cluster.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("RISC0_DEV_MODE", "1")

from risc0_tpu.parallel.config import launch_cluster, load_config  # noqa: E402
from risc0_tpu.parallel.scheduler import ProofJob  # noqa: E402
from risc0_tpu.zkvm.exec import ExecutorEnv  # noqa: E402
from risc0_tpu.zkvm.prover import DevModeProver  # noqa: E402

CONFIG = """
version = 1

[executor]
count = 1

[[prover]]
count = 4
subscribe = ["prove-segment", "lift", "join", "union", "resolve", "unwrap"]

[prover.simulate]
prove_segment_core = 0.05
lift = 0.02
join = 0.02
"""


def main():
    cluster = launch_cluster(load_config(CONFIG))
    try:
        elf = open("guests/loop.bin", "rb").read()
        count = 1024 * 494 + 818  # ~1M cycles -> multiple segments
        env = ExecutorEnv(segment_po2=16).write_slice(
            count.to_bytes(4, "little"))
        job = ProofJob(cluster.factory, DevModeProver(), env, elf)
        session, receipt = job.run()
        print(f"{len(session.segments)} segments -> 1 receipt "
              f"(exit: {receipt.claim.exit_code.kind})")
    finally:
        cluster.stop()


if __name__ == "__main__":
    main()
