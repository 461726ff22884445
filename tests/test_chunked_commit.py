"""Column-chunked group commit (hal jnp_hal chunked pipeline): per-column
NTT/LDE is exact under chunking, so the chunked path must be bit-identical
to the fused single-dispatch path.  The chunked path is what lets a
po2>=19 rv32im data group commit fit in HBM (RESOURCE_EXHAUSTED
otherwise) and streams host chunks instead of one bulk transfer."""

import numpy as np
import pytest

from risc0_tpu import field as F
from risc0_tpu.hal import jnp_hal as hal


@pytest.mark.parametrize("encode", [False, True])
@pytest.mark.parametrize("host_witness", [False, True])
def test_chunked_commit_bit_exact(monkeypatch, encode, host_witness):
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    cols, rows = 77, 256  # non-multiple of chunk_cols: exercises the tail
    witness = rng.integers(0, F.P, (cols, rows), dtype=np.uint32)

    w = witness if host_witness else jnp.asarray(witness)
    base = hal.commit_pipeline(w, "poseidon2", encode=encode)

    monkeypatch.setenv("RISC0_TPU_COMMIT_CHUNK_BYTES", "1")  # force chunking
    w2 = witness if host_witness else jnp.asarray(witness)
    chunked = hal.commit_pipeline(w2, "poseidon2", encode=encode)

    assert np.array_equal(np.asarray(base[0]), np.asarray(chunked[0]))
    assert np.array_equal(np.asarray(base[1]), np.asarray(chunked[1]))
    assert len(base[2]) == len(chunked[2])
    for a, b in zip(base[2], chunked[2]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_chunk_threshold_routing(monkeypatch):
    """Default threshold: small groups stay on the fused path (no chunk
    kernels compiled for them); a tiny threshold routes to chunked."""
    assert hal._chunk_bytes(np.zeros((211, 1 << 20), np.uint32)) > \
        hal._CHUNK_THRESHOLD() // 2  # po2=20 data group is chunk-eligible
    monkeypatch.setenv("RISC0_TPU_COMMIT_CHUNK_BYTES", "123")
    assert hal._CHUNK_THRESHOLD() == 123
