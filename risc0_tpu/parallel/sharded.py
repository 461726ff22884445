"""Multi-chip sharded proving (SURVEY §2.10.4/2.10.5).

`mesh_context(mesh, cols_axis)` installs a device mesh into the HAL: the
commit/check pipelines then annotate GSPMD shardings — trace columns
sharded across the axis for the per-column iNTT / zk-shift / LDE (no
collectives: each column's NTT is independent), ONE all-to-all reshard to
row-sharded evaluations for Poseidon2 leaf hashing, and row-sharded
Merkle folds.  All ops are deterministic, so a sharded prove emits a seal
byte-identical to the single-device prove (tests/test_sharded.py asserts
this on a virtual 8-device mesh).

This is the TPU-native replacement for the reference's multi-GPU row
split (risc0/zkp/src/hal/cuda.rs device-per-segment): here ONE segment's
commit spreads over the mesh via XLA collectives on ICI, composing with
segment data-parallelism from the scheduler.
"""

from __future__ import annotations

from contextlib import contextmanager

from ..hal import jnp_hal as hal


@contextmanager
def mesh_context(mesh, cols_axis: str = "tp"):
    """Install `mesh` for the HAL pipelines; restores on exit.

    One mesh per process: the pipelines' jit cache keys on a boolean
    `shard` flag, so switching BETWEEN different meshes in one process
    would reuse stale sharding layouts — enter a fresh process for a new
    topology (the deployment reality anyway)."""
    prev = dict(hal._SHARD)
    hal._SHARD.update({"mesh": mesh, "cols_axis": cols_axis,
                       "rows_axis": None})
    try:
        with mesh:
            yield
    finally:
        hal._SHARD.update(prev)


def commit_sharded(witness, mesh, cols_axis: str = "tp",
                   suite_name: str = "poseidon2", zk: bool = True):
    """One sharded group commit; returns (coeffs_nat, evaluated, layers)
    exactly like hal.commit_pipeline."""
    import jax.numpy as jnp

    with mesh_context(mesh, cols_axis):
        # the pipeline's in-graph sharding constraints distribute the
        # computation; inputs may arrive on any single device
        return hal.commit_pipeline(jnp.asarray(witness), suite_name, zk=zk)
