#!/usr/bin/env python3
"""Extract the recursion circuit definition from the reference's generated
artifacts: taps (taps.rs), the PolyExtStep constraint bytecode (poly_ext.rs —
intact in the snapshot), and the allowed control IDs (control_id.rs).

These are derived circuit *data*; the evaluator lives in
risc0_tpu/circuit/recursion/circuit.py (our own PolyExtStep interpreter,
reference semantics risc0/zkp/src/adapter.rs:152-401).
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
from extract_rv32im import extract_taps  # noqa: E402

SRC = "/root/reference/risc0/circuit/recursion/src"
OUT = os.path.join(os.path.dirname(__file__), "..", "risc0_tpu", "circuit",
                   "recursion", "data")

OPC = {"Const": 0, "ConstExt": 1, "Get": 2, "GetGlobal": 3, "Add": 4,
       "Sub": 5, "Mul": 6, "True": 7, "AndEqz": 8, "AndCond": 9}


def extract_poly_ext(path: str):
    src = open(path).read()
    steps = re.findall(r"PolyExtStep::(\w+)(?:\(([0-9, ]*)\))?,", src)
    opcode = np.zeros(len(steps), np.int8)
    operands = np.full((len(steps), 4), -1, np.int64)
    for i, (name, args) in enumerate(steps):
        opcode[i] = OPC[name]
        if args:
            vals = [int(x) for x in args.split(",") if x.strip()]
            operands[i, : len(vals)] = vals
    ret = int(re.search(r"ret: (\d+)", src).group(1))
    return opcode, operands, ret


def extract_control_ids(path: str):
    src = open(path).read()
    sections = {}
    # named digest lists
    for name in ("ALLOWED_CONTROL_IDS", "POSEIDON2_CONTROL_IDS",
                 "SHA256_CONTROL_IDS"):
        m = re.search(name + r"[^=]*= &?\[(.*?)\];", src, re.S)
        if m:
            digs = re.findall(r'digest!\("([0-9a-f]+)"\)', m.group(1))
            sections[name] = np.array(
                [np.frombuffer(bytes.fromhex(d), np.uint32) for d in digs])
    for name in ("ALLOWED_CONTROL_ROOT", "BN254_IDENTITY_CONTROL_ID"):
        m = re.search(name + r"[^=]*=\s*digest!\(\"([0-9a-f]+)\"\)", src)
        if m:
            sections[name] = np.frombuffer(bytes.fromhex(m.group(1)), np.uint32)
    return sections


def main():
    os.makedirs(OUT, exist_ok=True)
    taps = extract_taps(os.path.join(SRC, "taps.rs"))
    np.savez_compressed(os.path.join(OUT, "taps.npz"), **taps)
    print(f"taps: {len(taps['taps'])} taps, {taps['reg_count']} regs")

    opcode, operands, ret = extract_poly_ext(os.path.join(SRC, "poly_ext.rs"))
    np.savez_compressed(os.path.join(OUT, "poly_ext.npz"),
                        opcode=opcode, operands=operands, ret=ret)
    import collections

    counts = collections.Counter(
        [k for k, v in OPC.items() for _ in range(int((opcode == v).sum()))])
    print(f"poly_ext: {len(opcode)} steps, ret={ret}; {dict(counts)}")

    ids = extract_control_ids(os.path.join(SRC, "control_id.rs"))
    np.savez_compressed(os.path.join(OUT, "control_ids.npz"), **ids)
    print("control ids:", {k: v.shape for k, v in ids.items()})


if __name__ == "__main__":
    main()
