"""GDB stub (reference execute/gdb.rs): debug machine single-stepping,
breakpoints, and the RSP packet server driven by a minimal gdb client."""

import socket
import threading

import numpy as np
import pytest

from risc0_tpu.zkvm.gdb import DebugMachine, GdbStub, _checksum

LOOP = "guests/loop.bin"
LOOP_PC = 0x000100C8  # hot loop body pc (profiler-confirmed user code)


@pytest.fixture(scope="module")
def loop_elf():
    return open(LOOP, "rb").read()


def test_debug_machine_steps_and_halts(loop_elf):
    m = DebugMachine(loop_elf, input_data=(3).to_bytes(4, "little"))
    try:
        status, _pc = m.step(10)
        assert status == 0 and not m.halted()
        status, _pc = m.step(1 << 22)
        assert status == 1 and m.halted()
        assert m.exit_code() == 0
    finally:
        m.close()


def test_debug_machine_breakpoint(loop_elf):
    m = DebugMachine(loop_elf, input_data=(50).to_bytes(4, "little"))
    try:
        status, pc = m.step(1 << 22, breakpoints=[LOOP_PC])
        assert status == 2 and pc == LOOP_PC
        assert m.pc() == LOOP_PC
        regs = m.regs()
        assert regs.shape == (32,) and np.any(regs != 0)
        # memory read at the breakpoint returns the loop insn bytes
        insn = m.read_mem(LOOP_PC, 4)
        assert len(insn) == 4 and insn != b"\x00\x00\x00\x00"
        # stepping past the breakpoint makes progress and re-hits it
        status, pc = m.step(1 << 22, breakpoints=[LOOP_PC])
        assert status == 2 and pc == LOOP_PC
    finally:
        m.close()


class _RspClient:
    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port))

    def cmd(self, payload: str) -> str:
        raw = payload.encode()
        self.sock.sendall(b"$" + raw + b"#" + b"%02x" % _checksum(raw))
        buf = b""
        while True:
            buf += self.sock.recv(4096)
            s = buf.find(b"$")
            e = buf.find(b"#", s)
            if s >= 0 and e >= 0 and len(buf) >= e + 3:
                return buf[s + 1 : e].decode()


def test_rsp_session(loop_elf):
    stub = GdbStub(loop_elf, input=(50).to_bytes(4, "little"))
    port = stub.listen()
    t = threading.Thread(target=stub.serve_forever, daemon=True)
    t.start()
    c = _RspClient(port)

    assert "PacketSize" in c.cmd("qSupported:swbreak+")
    assert c.cmd("?") == "S05"
    assert c.cmd(f"Z0,{LOOP_PC:x},4") == "OK"
    assert c.cmd("c") == "T05swbreak:;"
    # g returns 33 little-endian words; pc (last) == breakpoint
    g = c.cmd("g")
    assert len(g) == 33 * 8
    pc = int.from_bytes(bytes.fromhex(g[-8:]), "little")
    assert pc == LOOP_PC
    # single register read: pc is regnum 32
    assert int.from_bytes(bytes.fromhex(c.cmd("p20")), "little") == LOOP_PC
    # memory read
    mem = c.cmd(f"m{LOOP_PC:x},4")
    assert len(mem) == 8 and mem != "00000000"
    # step makes progress
    assert c.cmd("s") in ("S05", "T05swbreak:;")
    # clear the breakpoint and run to completion
    assert c.cmd(f"z0,{LOOP_PC:x},4") == "OK"
    assert c.cmd("c") == "W00"
    c.sock.close()
    t.join(timeout=10)


def test_trace_events(loop_elf):
    """TraceEvent stream (reference trace.rs): InstructionStart per
    user-mode insn with the encoded word; RegisterSet diffs."""
    from risc0_tpu.zkvm.trace import (InstructionStart, RegisterSet,
                                      trace_execution)

    events = list(trace_execution(loop_elf,
                                  input_data=(3).to_bytes(4, "little")))
    starts = [e for e in events if isinstance(e, InstructionStart)]
    regs = [e for e in events if isinstance(e, RegisterSet)]
    assert len(starts) > 10 and len(regs) > 5
    # the hot loop pc appears with a decodable insn word
    loop_starts = [e for e in starts if e.pc == LOOP_PC]
    assert loop_starts and all(e.insn == loop_starts[0].insn
                               for e in loop_starts)
    assert loop_starts[0].insn != 0
    # cycles monotonically increase
    cycles = [e.cycle for e in starts]
    assert cycles == sorted(cycles)
