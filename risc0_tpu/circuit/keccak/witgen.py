"""Keccak witness generation: preflight scatter + bytecode interpreter run.

Mirrors the reference keccak prover data path (keccak/src/prove/mod.rs:
scatter_preflight + generate_witness + zeroize); the exec program is
extracted from keccak-sys/kernels/cxx/steps_*.cpp by scripts/
extract_witgen.py keccak.
"""

from __future__ import annotations

import ctypes as C
import json
import os
import struct

import numpy as np

from ...zkvm import native
from .preflight import KeccakPreflight, apply_scatter

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
INVALID = np.uint32(0xFFFFFFFF)

REGCOUNT_DATA = 1096
REGCOUNT_GLOBAL = 17
REGCOUNT_MIX = 4
REGCOUNT_ACCUM = 1


def _load_meta():
    with open(os.path.join(_DATA_DIR, "witgen_meta.json")) as f:
        return json.load(f)


_meta = _load_meta()
SCATTER_COLS = _meta["scatter"]
GLOBAL_META = _meta["global"]


def _load_program():
    with open(os.path.join(_DATA_DIR, "witgen_exec.bin"), "rb") as f:
        magic, n_ops, n_slots, n_ext, _ = struct.unpack("<4sIIII",
                                                        f.read(20))
        assert magic == b"WGN1"
        ops = np.frombuffer(f.read(n_ops * 20), np.uint32).reshape(n_ops, 5)
        ext = np.frombuffer(f.read(n_ext * 16), np.uint32).reshape(n_ext, 4) \
            if n_ext else np.zeros((1, 4), np.uint32)
    return {"ops": np.ascontiguousarray(ops), "n_slots": n_slots,
            "ext": np.ascontiguousarray(ext)}


_prog = None


def _program():
    global _prog
    if _prog is None:
        _prog = _load_program()
        lib = native.lib()
        lib.r0_witgen_run.restype = C.c_int
        lib.r0_witgen_error.restype = C.c_char_p
        _prog["lib"] = lib
    return _prog


def _u32p(a):
    return a.ctypes.data_as(C.POINTER(C.c_uint32))


def witgen_keccak(inputs, po2, n_threads=0):
    """Generate the keccak witness for a batch of keccak states.

    inputs: list of 25-element u64 iterables.  Returns dict with data
    (1096, 2^po2) and global (17,) standard-form u32 columns plus the
    preflight object.
    """
    prog = _program()
    lib = prog["lib"]
    rows = 1 << po2
    pf = KeccakPreflight([list(s) for s in inputs], rows)

    data = np.full((REGCOUNT_DATA, rows), INVALID, np.uint32)
    apply_scatter(data, pf.scatter, pf.data)

    glob = np.full(REGCOUNT_GLOBAL, INVALID, np.uint32)
    glob[GLOBAL_META["total_cycles"]] = rows

    # preimage table: (n, 100) 16-bit chunks (ffi.cpp extern_getPreimage)
    n = len(pf.preimages)
    preimages = np.zeros((max(n, 1), 100), np.uint32)
    for i, st in enumerate(pf.preimages):
        for j in range(25):
            for k in range(4):
                preimages[i, j * 4 + k] = (st[j] >> (16 * k)) & 0xFFFF
    cur = np.asarray(pf.cur_preimage, np.uint32)

    rc = lib.r0_witgen_run(
        _u32p(prog["ops"]), len(prog["ops"]), prog["n_slots"],
        _u32p(prog["ext"]),
        None, rows, None, 0, None, 0,
        _u32p(data), _u32p(glob), None, None,
        0, rows, None, None, n_threads,
        _u32p(preimages), _u32p(cur), n)
    if rc != 0:
        raise RuntimeError(lib.r0_witgen_error().decode())
    data[data == INVALID] = 0
    glob[glob == INVALID] = 0
    return {"data": data, "global": glob, "rows": rows, "preflight": pf}
