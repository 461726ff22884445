"""Proof-of-verifiable-work example (reference risc0/povw): run a guest
under a PoVW job id so every segment proof consumes a unique nonce, then
inspect the accumulated Work record and update a prover-side WorkLog.

Dev-mode by default (fake receipts, instant); set RISC0_DEV_MODE=0 with
generated povw predicates for the cryptographic WorkClaim chain.

    python examples/povw.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", os.environ.get("RISC0_EXAMPLE_PLATFORM",
                                                  "cpu"))

os.environ.setdefault("RISC0_DEV_MODE", "1")

from risc0_tpu.parallel.scheduler import (Factory, ProofJob,  # noqa: E402
                                          make_local_pools)
from risc0_tpu.zkvm.exec import ExecutorEnv  # noqa: E402
from risc0_tpu.zkvm.povw import PovwJobId, WorkLog  # noqa: E402
from risc0_tpu.zkvm.prover import get_prover_server  # noqa: E402


def main():
    elf = open(Path(__file__).parent.parent / "guests" / "loop.bin",
               "rb").read()
    job_id = PovwJobId(log=0x1234_5678_9ABC_DEF0, job=1)

    # enough iterations for several segments at po2=16
    count = 1024 * 494 + 818
    env = ExecutorEnv(segment_po2=16, povw_job_id=job_id).write_slice(
        count.to_bytes(4, "little"))

    factory = Factory()
    prover = get_prover_server()
    workers = make_local_pools(factory, prover, num_cpu=1, num_accel=2)
    try:
        proof_job = ProofJob(factory, prover, env, elf)
        session, receipt = proof_job.run()
    finally:
        for w in workers:
            w.stop()

    work = proof_job.work
    print(f"segments proved : {len(session.segments)}")
    print(f"nonce range     : segment {work.nonce_min.segment}"
          f" .. {work.nonce_max.segment} (job {work.nonce_min.job})")
    print(f"work value      : {work.value} cycles")
    print(f"final claim     : {receipt.claim.exit_code.kind}")

    # record the consumed nonce range in this prover's work log (reuse of
    # a nonce would raise; reference povw/src/tree.rs)
    log = WorkLog(log_id=job_id.log)
    log.record(work)
    print(f"work log commit : {bytes(log.commit().tobytes()).hex()[:16]}…")

    # export to the reference's on-chain sparse-tree layout and prove a
    # nonce was consumed (povw_tree.py; reference povw/src/tree.rs)
    from risc0_tpu.zkvm.povw_tree import WorkSet

    ws = WorkSet({job_id.log: log.to_tree()})
    nonce = job_id.nonce(0).to_u256()
    opening = ws.prove_opening(nonce)
    opening.verify_inclusion(ws.commit(), nonce)
    print(f"on-chain root   : {ws.commit().hex()[:16]}… "
          f"(inclusion proof for segment-0 nonce verified)")


if __name__ == "__main__":
    main()
