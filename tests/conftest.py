"""Test configuration: run JAX on a virtual 8-device CPU mesh by default.

Multi-chip sharding logic is validated on virtual CPU devices
(xla_force_host_platform_device_count); real-TPU runs use bench.py or set
RISC0_TPU_TEST_TPU=1.

NOTE: this image registers a remote TPU backend from sitecustomize before
conftest runs, so jax is already imported here; we switch platforms through
jax.config (effective until the backend is first used) rather than env vars.
"""

import os

if not os.environ.get("RISC0_TPU_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: repeated suite runs skip the big XLA
    # compiles (fib proves, sharded pipelines, eval_check); tracing still
    # runs per process
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
