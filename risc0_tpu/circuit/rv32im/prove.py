"""rv32im segment proving: witgen -> generic STARK prover -> seal.

Mirrors the reference seal flow (risc0/circuit/rv32im/src/prove/hal/mod.rs
:143-224 prove_core): seal version word, proof-system + circuit info
commits, globals||po2 header, code/data group commits, Fiat-Shamir mix,
accum commit, then the generic DEEP-ALI/FRI finalize.
"""

from __future__ import annotations

import os

import numpy as np

from ... import field as F
from ... import perf
from ...hash.suite import POSEIDON2
from ...prove.prover import Prover
from ...taps import (REGISTER_GROUP_ACCUM, REGISTER_GROUP_CODE,
                     REGISTER_GROUP_DATA)
from ...verify import verifier as V
from .circuit import load_circuit
from .verify import RV32IM_SEAL_VERSION
from .witgen import (REGCOUNT_MIX, witgen_accum, witgen_exec)


class Rv32imCircuitHal:
    """Device eval_check via the range-file executor (ir_range): the whole
    4x domain runs as lax.map over chunks inside one jit — a single device
    dispatch and one compile per po2, no scatters, emadd chains collapsed
    into batched reductions.  Output stays on device."""

    _fns = {}   # po2 -> jitted full-domain runner
    _plan = None

    def __init__(self, circuit, chunk=None):
        self.circuit = circuit
        # chunk T trades per-chunk device occupancy against register-file
        # memory (ir_range runs lax.map over domain/T chunks); tunable for
        # on-chip A/B via RISC0_TPU_EVAL_CHUNK
        self.chunk = chunk or int(os.environ.get("RISC0_TPU_EVAL_CHUNK",
                                                 str(1 << 13)))
        if Rv32imCircuitHal._plan is None:
            from .. import ir_range
            Rv32imCircuitHal._plan = ir_range.build_range_plan(circuit)
            circuit.range_plan = Rv32imCircuitHal._plan

    def eval_check(self, groups, globals_list, poly_mix, po2):
        import jax.numpy as jnp

        from ...hal import jnp_hal as hal
        from .. import ir_range

        plan = Rv32imCircuitHal._plan
        key = (po2, hal._SHARD["mesh"] is not None)
        fn = Rv32imCircuitHal._fns.get(key)
        if fn is None:
            fn = ir_range.make_eval_check(
                self.circuit, po2, chunk=self.chunk)
            Rv32imCircuitHal._fns[key] = fn
        mix_g, out_g = (np.asarray(g, np.uint32) for g in globals_list)
        accum, code, data = groups
        bufmap = {0: accum, 1: data, 4: code}
        evs = tuple(jnp.asarray(bufmap[b]) for b in ir_range.plan_buf_ids(plan))
        gvals = jnp.asarray(np.array(
            [(out_g if b == 2 else mix_g)[i] for b, i in plan.global_specs],
            np.uint32))
        pm_pows = jnp.asarray(self.circuit.mix_pows(poly_mix))
        return fn(evs, gvals, pm_pows)


def segment_preflight(seg, rand_z=None, rng=None):
    """CPU-side half of segment proving: preflight re-execution + exec
    witness generation (reference ProverServer::segment_preflight,
    host/server/prove/mod.rs:79-82).  Returns the witness dict consumed
    by prove_segment_core, so a scheduler can run this on a CPU pool
    while the device proves the previous segment."""
    rng = rng or np.random.default_rng()
    if rand_z is None:
        rand_z = tuple(int(x) for x in rng.integers(0, F.P, 4))

    with perf.scope("witgen_exec"):
        return witgen_exec(seg, rand_z=rand_z)


def prove_segment(seg, suite=None, rand_z=None, rng=None, use_jit=True):
    """Prove one executed segment; returns the seal (uint32 words)."""
    if use_jit and os.environ.get("RISC0_TPU_DEVICE_EXEC") == "1":
        # witness generation on the chip (exec_device.py): the data
        # matrix is born on device — no host interpreter pass and no
        # witness transfer.  Host keeps only the preflight re-emulation.
        from .exec_device import witgen_exec_device

        rng = rng or np.random.default_rng()
        if rand_z is None:
            rand_z = tuple(int(x) for x in rng.integers(0, F.P, 4))
        with perf.scope("witgen_exec"):
            res = witgen_exec_device(seg, rand_z=rand_z)
    else:
        res = segment_preflight(seg, rand_z=rand_z, rng=rng)
    return prove_segment_core(res, suite=suite, use_jit=use_jit)


def prove_segment_core(res, suite=None, use_jit=True):
    """Device half of segment proving over a preflight/witgen result
    (reference ProverServer::prove_segment_core, prove/mod.rs:83-86)."""
    import jax.numpy as jnp

    suite = suite or POSEIDON2
    circuit = load_circuit()
    po2 = int(np.log2(res["rows"]))
    assert (1 << po2) == res["rows"]
    cycles = res["rows"]

    with perf.scope("encode_host"):
        # only the 90-word globals encode on host (header needs them);
        # the big data/accum matrices encode on device inside the commit
        global_m = F.encode_np(res["global"])
        code_m = np.zeros((1, cycles), np.uint32)  # zeroized code group

    prover = Prover(suite, circuit.taps)
    iop = prover.iop
    iop.write_u32s([RV32IM_SEAL_VERSION])

    info = np.frombuffer(V.PROOF_SYSTEM_INFO.ljust(16, b"\0")[:16], np.uint8)
    iop.commit(suite.hash_elem_slice(F.encode_np(info.astype(np.uint32))))
    info = np.frombuffer(circuit.CIRCUIT_INFO.ljust(16, b"\0")[:16], np.uint8)
    iop.commit(suite.hash_elem_slice(F.encode_np(info.astype(np.uint32))))

    header = np.concatenate([global_m, np.array([po2], np.uint32)])
    iop.commit(suite.hash_elem_slice(header))
    iop.write_field_elems(header)
    prover.set_po2(po2)

    with perf.scope("to_device.code"):
        code_d = jnp.asarray(code_m)
    prover.commit_group(REGISTER_GROUP_CODE, code_d)
    # data stays a host array: the commit pipeline bulk-transfers small
    # groups and STREAMS large ones chunk-by-chunk (hal chunked commit),
    # overlapping host->device transfer with the NTT/LDE compute
    prover.commit_group(REGISTER_GROUP_DATA, res["data"], encode=True)

    mix_m = np.array([iop.random_elem() for _ in range(REGCOUNT_MIX)],
                     np.uint32)
    device_accum = use_jit and os.environ.get("RISC0_TPU_HOST_ACCUM") != "1"
    if device_accum:
        # accum runs on the chip (if-converted graph + affine scan,
        # accum_device.py): no 12 s host interpreter pass and no
        # host->device transfer of the 103-column matrix; output stays
        # Montgomery so the commit skips its encode pass
        from .accum_device import witgen_accum_device
        with perf.scope("witgen_accum"):
            accum_m = witgen_accum_device(res, F.decode_np(mix_m))
        from ...hal import jnp_hal as hal
        mesh = hal._SHARD.get("mesh")
        if mesh is not None:
            # the accum graph runs single-device, so its output is
            # COMMITTED to device 0; the sharded commit's in-graph
            # constraint spans the whole mesh and jit rejects the
            # placement conflict — re-place as mesh-replicated (the
            # commit reshards to its column layout internally)
            import jax
            from jax.sharding import NamedSharding, PartitionSpec
            accum_m = jax.device_put(
                accum_m, NamedSharding(mesh, PartitionSpec()))
        prover.commit_group(REGISTER_GROUP_ACCUM, accum_m, encode=False)
    else:
        with perf.scope("witgen_accum"):
            accum = witgen_accum(res, F.decode_np(mix_m))
        prover.commit_group(REGISTER_GROUP_ACCUM, accum, encode=True)

    if use_jit:
        hal_obj = Rv32imCircuitHal(circuit)
    else:
        hal_obj = _NpCircuitHal(circuit)
    return prover.finalize([mix_m, global_m], hal_obj)


class _NpCircuitHal:
    """Level-scheduled plan evaluator, chunked over the domain
    (risc0_tpu/circuit/ir_exec.py; conformance-tested vs poly_ext)."""

    _plan = None

    def __init__(self, circuit):
        self.circuit = circuit
        if _NpCircuitHal._plan is None:
            from .. import ir_exec
            _NpCircuitHal._plan = ir_exec.build_plan(circuit)

    def eval_check(self, groups, globals_list, poly_mix, po2):
        from .. import ir_exec
        plan = _NpCircuitHal._plan
        mix_g, out_g = (np.asarray(g, np.uint32) for g in globals_list)
        accum, _code, data = (np.asarray(g) for g in groups)
        cycles = 1 << po2
        domain = cycles * 4

        pm_pows = self.circuit.mix_pows(poly_mix)

        gvals = np.array([(out_g if b == 2 else mix_g)[i]
                          for b, i in plan.global_specs], np.uint32)
        bufs = {0: accum, 1: data}
        chunk = 1 << 14
        tot = np.zeros((domain, 4), np.uint32)
        for start in range(0, domain, chunk):
            T = min(chunk, domain - start)
            tapm = ir_exec.build_tap_matrix_np(plan, bufs, start, T, domain)
            tot[start:start + T] = ir_exec.execute_plan_np(
                plan, tapm, gvals, pm_pows)

        w = F.s_encode(F.ROU_FWD[po2 + 2])
        kpow = F.s_pow(F.s_encode(3), cycles)
        wq = F.s_pow(w, cycles)
        ys, cw = [], F.R % F.P
        for _ in range(4):
            ys.append(F.s_inv(F.s_sub(F.s_mul(kpow, cw), F.R % F.P)))
            cw = F.s_mul(cw, wq)
        invz = np.tile(np.array(ys, np.uint32), domain // 4)
        return F.mul_np(tot, invz[:, None]).T
