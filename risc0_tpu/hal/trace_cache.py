"""Cross-process trace cache for big jitted computations.

The XLA *compile* cache (jax_compilation_cache_dir) persists compiled
executables across processes, but JAX still re-traces the Python function
every process to produce the HLO that keys that cache.  For the constraint
IR evaluators that trace is the dominant warm-up cost (~50 s/process for
the 26k-op rv32im eval_check; reference keeps these as pre-generated CUDA
kernels, risc0/circuit/rv32im-sys/kernels/ — our equivalent of "pre-
generated" is a serialized StableHLO module).

`TraceCached` wraps a jitted function: the first process exports it with
`jax.export` (one trace), serializes the StableHLO module to disk, and
every later process deserializes + calls the module directly — no
re-trace, and the embedded module hashes identically so the XLA persistent
compile cache still hits.

Cache keys include the jax version, backend platform, arg shapes/dtypes,
caller-provided key parts (circuit fingerprint, po2, chunk), and a digest
of the IR-executor sources, so stale artifacts can never be replayed
against changed code.  Any failure falls back to the plain jitted path.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

_CACHE_DIR = os.environ.get("RISC0_TRACE_CACHE",
                            os.path.expanduser("~/.cache/risc0_tpu_trace"))
_DISABLE = os.environ.get("RISC0_TRACE_CACHE_DISABLE") == "1"

# source files whose changes invalidate every cached trace
_SRC_FILES = ("circuit/ir_range.py", "circuit/ir_exec.py", "field.py",
              "hal/trace_cache.py", "circuit/rv32im/accum_device.py",
              "circuit/rv32im/exec_device.py")


def _src_digest() -> str:
    h = hashlib.sha256()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rel in _SRC_FILES:
        try:
            with open(os.path.join(root, rel), "rb") as f:
                h.update(f.read())
        except OSError:
            pass
    return h.hexdigest()[:16]


def _hash_part(h, obj):
    """Structured hash over nested tuples/lists/dicts/ndarrays/scalars."""
    if isinstance(obj, np.ndarray):
        h.update(b"nd")
        h.update(str(obj.dtype).encode())
        h.update(str(obj.shape).encode())
        h.update(np.ascontiguousarray(obj).tobytes())
    elif isinstance(obj, (list, tuple)):
        h.update(b"seq%d" % len(obj))
        for x in obj:
            _hash_part(h, x)
    elif isinstance(obj, dict):
        h.update(b"map%d" % len(obj))
        for k in obj:  # insertion order is part of plan identity
            _hash_part(h, k)
            _hash_part(h, obj[k])
    elif isinstance(obj, (str, bytes)):
        h.update(obj.encode() if isinstance(obj, str) else obj)
    elif isinstance(obj, (int, float, bool, np.integer)) or obj is None:
        h.update(repr(obj).encode())
    elif hasattr(obj, "__dataclass_fields__"):
        h.update(type(obj).__name__.encode())
        for name in obj.__dataclass_fields__:
            _hash_part(h, getattr(obj, name))
    else:
        h.update(repr(obj).encode())


def fingerprint(*parts) -> str:
    h = hashlib.sha256()
    for p in parts:
        _hash_part(h, p)
    return h.hexdigest()[:24]


class TraceCached:
    """Lazy wrapper: resolves to a deserialized exported module when a
    cached artifact matches, else traces `fn` once and saves the export."""

    def __init__(self, fn, key: str, label: str = "fn"):
        self._fn = fn
        self._key = key
        self._label = label
        self._callable = None

    def _path(self, args) -> str:
        import jax

        h = hashlib.sha256()
        h.update(jax.__version__.encode())
        h.update(jax.default_backend().encode())
        h.update(_src_digest().encode())
        h.update(self._key.encode())
        for a in jax.tree.leaves(args):
            h.update((str(a.shape) + str(a.dtype)).encode())
        return os.path.join(
            _CACHE_DIR, f"{self._label}-{h.hexdigest()[:24]}.jaxexp")

    def _resolve(self, args):
        import jax

        if _DISABLE:
            return self._fn
        path = self._path(args)
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    exp = jax.export.deserialize(bytearray(f.read()))
                call = jax.jit(exp.call)
                from .. import log
                log.event("trace_cache.hit", label=self._label, path=path)
                return call
            except Exception as e:  # stale/corrupt artifact: re-trace
                from .. import log
                log.event("trace_cache.stale", label=self._label,
                          error=repr(e))
                try:
                    os.remove(path)
                except OSError:
                    pass
        try:
            specs = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args)
            exp = jax.export.export(self._fn)(*specs)
            os.makedirs(_CACHE_DIR, exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(exp.serialize())
            os.replace(tmp, path)
            from .. import log
            log.event("trace_cache.saved", label=self._label, path=path)
        except Exception as e:  # export unsupported: plain jit path
            from .. import log
            log.event("trace_cache.export_failed", label=self._label,
                      error=repr(e))
        return self._fn

    def __call__(self, *args):
        if self._callable is None:
            from .. import perf
            with perf.scope(f"trace_cache.resolve.{self._label}"):
                self._callable = self._resolve(args)
        return self._callable(*args)
