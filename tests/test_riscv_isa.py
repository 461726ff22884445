"""Official riscv-tests ISA conformance matrix (riscv-software-src/
riscv-tests binaries, the same public test data the reference embeds at
zkvm/src/host/server/prove/tests.rs:355-456): every rv32im instruction
test runs bare-metal (kernel-only, reference from_kernel_elf) in the
emulator and must halt with exit code 0 — each binary self-checks every
architectural corner case and loops into a failure ecall otherwise."""

import io
import tarfile

import pytest

from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

TGZ = "/root/repo/tests/data/riscv-tests.tgz"

ISA_TESTS = sorted([
    "add", "addi", "and", "andi", "auipc", "beq", "bge", "bgeu", "blt",
    "bltu", "bne", "div", "divu", "fence", "jal", "jalr", "lb", "lbu",
    "lh", "lhu", "lui", "lw", "mul", "mulh", "mulhsu", "mulhu", "or",
    "ori", "rem", "remu", "sb", "sh", "simple", "sll", "slli", "slt",
    "slti", "sltiu", "sltu", "sra", "srai", "srl", "srli", "sub", "sw",
    "xor", "xori",
])


@pytest.fixture(scope="module")
def elves():
    out = {}
    with tarfile.open(TGZ, "r:gz") as tar:
        for m in tar.getmembers():
            if m.isfile():
                out[m.name.rsplit("/", 1)[-1]] = tar.extractfile(m).read()
    return out


@pytest.mark.parametrize("name", ISA_TESTS)
def test_riscv_isa(name, elves):
    env = ExecutorEnv(segment_po2=15)
    session = ExecutorImpl.from_kernel_elf(env, elves[name]).run()
    assert session.exit_code == ("Halted", 0), name


def test_kernel_only_segment_witgen(elves):
    """A bare-metal segment (mode-1-only execution, no userspace ecalls)
    goes through preflight + witgen cleanly: the generated EQZ assertions
    run on every row and the accum running sums cancel."""
    import numpy as np

    from risc0_tpu import field as F
    from risc0_tpu.circuit.rv32im.witgen import witgen_accum, witgen_exec

    env = ExecutorEnv(segment_po2=15)
    session = ExecutorImpl.from_kernel_elf(env, elves["add"]).run()
    assert len(session.segments) == 1
    seg = session.segments[0]

    rng = np.random.default_rng(9)
    rand_z = tuple(int(x) for x in rng.integers(0, F.P, 4))
    res = witgen_exec(seg, rand_z=rand_z)
    mix = rng.integers(0, F.P, 36).astype(np.uint32)
    acc = witgen_accum(res, mix)
    assert (acc[-4:, -1] == 0).all()


def test_kernel_only_image_id_distinct(elves):
    """Kernel-only image ids are deterministic and program-specific."""
    import numpy as np

    env = ExecutorEnv(segment_po2=15)
    a = ExecutorImpl.from_kernel_elf(env, elves["add"]).compute_image_id()
    a2 = ExecutorImpl.from_kernel_elf(env, elves["add"]).compute_image_id()
    b = ExecutorImpl.from_kernel_elf(env, elves["sub"]).compute_image_id()
    assert np.array_equal(a, a2)
    assert not np.array_equal(a, b)
