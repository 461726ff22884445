"""Hierarchical scope timers (reference: risc0/core/src/perf.rs:41-74).

The reference wraps hot phases in `tracing` spans behind a feature flag;
here a `scope(name)` context manager accumulates (calls, seconds) per
dotted path into a process-global registry.  Enabled by default (the
overhead is two clock reads per scope); `report()` returns the table,
`reset()` clears it, and `summary()` formats it for logs / bench output.

On an async device backend a scope measures *dispatch* time unless the
stage ends in a host readback; pass `sync=arr` to force a block on a
device value so the scope covers real device work.
"""

from __future__ import annotations

import os
import threading
import time
from contextlib import contextmanager

_lock = threading.Lock()
_stats: dict[str, list[float]] = {}   # path -> [calls, seconds]
_tls = threading.local()

ENABLED = os.environ.get("RISC0_TPU_PERF", "1") != "0"


def _stack():
    if not hasattr(_tls, "stack"):
        _tls.stack = []
    return _tls.stack


@contextmanager
def scope(name: str, sync=None):
    """Time a region; nested scopes form dotted paths (a.b.c)."""
    if not ENABLED:
        yield
        return
    st = _stack()
    st.append(name)
    path = ".".join(st)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            try:
                sync.block_until_ready()
            except AttributeError:
                pass
        dt = time.perf_counter() - t0
        st.pop()
        with _lock:
            ent = _stats.setdefault(path, [0, 0.0])
            ent[0] += 1
            ent[1] += dt


def report() -> dict[str, tuple[int, float]]:
    """{dotted path: (calls, total seconds)} snapshot."""
    with _lock:
        return {k: (v[0], v[1]) for k, v in _stats.items()}


def reset():
    with _lock:
        _stats.clear()


def toplevel_seconds() -> float:
    """Sum of depth-0 scope time — compare against an externally timed
    total to expose unscoped host time (the async-dispatch gap hunt)."""
    return sum(secs for path, (_c, secs) in report().items()
               if "." not in path)


def device_memory() -> dict | None:
    """Current/peak device-allocator bytes (the HAL MemoryTracker
    equivalent, reference zkp/src/hal/mod.rs:292-317, surfaced in the
    datasheet).  Returns None when the backend doesn't report (jax CPU
    often doesn't); on TPU this is HBM in-use/peak/limit."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    keep = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    out = {k: int(stats[k]) for k in keep if k in stats}
    return out or None


def summary(min_ms: float = 0.1) -> str:
    rows = sorted(report().items(), key=lambda kv: -kv[1][1])
    lines = []
    for path, (calls, secs) in rows:
        if secs * 1e3 < min_ms:
            continue
        lines.append(f"{secs * 1e3:10.1f} ms  x{calls:<5d} {path}")
    return "\n".join(lines)
