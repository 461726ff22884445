"""Guest cycle profiler (reference host/server/exec/profiler.rs): the
native executor's pc->cycles map must account for every user cycle, and
the pprof encoding must be valid protobuf."""

import numpy as np
import pytest

from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl
from risc0_tpu.zkvm.profiler import Profiler, elf_functions

LOOP = "guests/loop.bin"


def _decode_fields(buf: bytes):
    """Minimal protobuf wire decoder: yields (field_no, wire, value)."""
    i = 0

    def varint():
        nonlocal i
        n = s = 0
        while True:
            b = buf[i]
            i += 1
            n |= (b & 0x7F) << s
            if not b & 0x80:
                return n
            s += 7

    while i < len(buf):
        tag = varint()
        field_no, wire = tag >> 3, tag & 7
        if wire == 0:
            yield field_no, wire, varint()
        elif wire == 2:
            ln = varint()
            yield field_no, wire, buf[i : i + ln]
            i += ln
        else:
            raise AssertionError(f"unexpected wire type {wire}")


@pytest.fixture(scope="module")
def profiled_session():
    elf = open(LOOP, "rb").read()
    env = ExecutorEnv(segment_po2=16).write_slice(
        (5000).to_bytes(4, "little")).enable_profiler()
    session = ExecutorImpl(env, elf).run()
    return session, env.profiler


def test_profile_accounts_for_all_user_cycles(profiled_session):
    session, prof = profiled_session
    assert prof.total_cycles() == session.user_cycles
    assert len(prof.samples) > 3


def test_profile_symbolizes_kernel_functions(profiled_session):
    _session, prof = profiled_session
    names = [n for n, _ in prof.top_functions(50)]
    # v1compat kernel ELF carries a symtab; the ecall dispatcher must show
    assert any("ecall" in n for n in names)


def test_pprof_encoding_is_valid_protobuf(profiled_session):
    _session, prof = profiled_session
    blob = prof.encode_to_vec()
    strings, n_samples, n_locs, n_funcs = [], 0, 0, 0
    sample_total = 0
    for field_no, _wire, val in _decode_fields(blob):
        if field_no == 6:
            strings.append(val.decode())
        elif field_no == 2:
            n_samples += 1
            for f2, _w2, v2 in _decode_fields(val):
                if f2 == 2:  # packed int64 values: decode varints directly
                    i, tot = 0, 0
                    while i < len(v2):
                        n = s = 0
                        while True:
                            b = v2[i]
                            i += 1
                            n |= (b & 0x7F) << s
                            if not b & 0x80:
                                break
                            s += 7
                        tot += n
                    sample_total += tot
        elif field_no == 4:
            n_locs += 1
        elif field_no == 5:
            n_funcs += 1
    assert "cycles" in strings and "count" in strings
    assert n_samples == len(prof.samples) == n_locs
    assert n_funcs >= 1
    assert sample_total == prof.total_cycles()


def test_elf_functions_parses_symtab():
    from risc0_tpu.zkvm.exec import V1COMPAT_ELF_PATH

    funcs = elf_functions(open(V1COMPAT_ELF_PATH, "rb").read())
    assert len(funcs) > 5
    addrs = [a for a, _s, _n in funcs]
    assert addrs == sorted(addrs)


def test_profiler_empty_elf_list_falls_back_to_addresses():
    p = Profiler()
    p.add_samples([0x1000, 0x1004], [7, 9])
    top = p.top_functions()
    assert ("0x00001004", 9) in top and ("0x00001000", 7) in top
    assert p.encode_to_vec()  # encodes without symbols
