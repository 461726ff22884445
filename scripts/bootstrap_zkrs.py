"""Bootstrap-style execution matrix over EVERY shipped recursion program.

The reference proves each .zkr during bootstrap to derive control IDs
(/root/reference/xtask/src/bootstrap.rs:14-50); this script goes further
and proves + verifies a receipt THROUGH every shipped predicate at least
once (VERDICT r4 item 3): lift 14..22, lift_povw 14..22, keccak_lift
14..18, join, join_povw, join_unwrap_povw, unwrap_povw, resolve,
resolve_povw, resolve_unwrap_povw, union, identity(p254).

Resumable: artifacts (receipts) are pickled under .bootstrap/; finished
steps are skipped on re-run.  Results append to ZKR_MATRIX.md.

    PYTHONPATH=/root/repo python scripts/bootstrap_zkrs.py [--only NAME]
        [--big]   # include po2 21/22 rv32im segments (chunked/sharded)
        [--list]  # print the step plan and exit
"""

from __future__ import annotations

import argparse
import datetime
import os
import pickle
import sys
import time
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WORK = os.path.join(REPO, ".bootstrap")
MATRIX = os.path.join(REPO, "ZKR_MATRIX.md")
LOOP = os.path.join(REPO, "guests", "loop.bin")


def _count_for_po2(po2: int, fill=0.70) -> int:
    return max(1, int((fill * (1 << po2) - 13000) / 2.02))


def _save(name, obj):
    os.makedirs(WORK, exist_ok=True)
    with open(os.path.join(WORK, name + ".pkl"), "wb") as f:
        pickle.dump(obj, f)


def _load(name):
    with open(os.path.join(WORK, name + ".pkl"), "rb") as f:
        return pickle.load(f)


def _have(name):
    return os.path.exists(os.path.join(WORK, name + ".pkl"))


def _record(name, outcome, dt, note=""):
    new = not os.path.exists(MATRIX)
    with open(MATRIX, "a") as f:
        if new:
            f.write(
                "# ZKR_MATRIX — every shipped recursion program proven\n\n"
                "Produced by scripts/bootstrap_zkrs.py (resumable; "
                "reference analog xtask/src/bootstrap.rs:14-50).\n\n"
                "| date (UTC) | step | runtime | result | note |\n"
                "|---|---|---|---|---|\n")
        date = datetime.datetime.utcnow().strftime("%Y-%m-%d %H:%M")
        f.write(f"| {date} | {name} | {dt:.1f} s | {outcome} | {note} |\n")


def _done_steps():
    if not os.path.exists(MATRIX):
        return set()
    done = set()
    for line in open(MATRIX):
        parts = [p.strip() for p in line.split("|")]
        if len(parts) >= 6 and parts[4] == "PASS":
            done.add(parts[2])
    return done


# ---------------------------------------------------------------------------
# step builders (each returns an artifact; raises on failure)
# ---------------------------------------------------------------------------

def _ctx():
    from risc0_tpu.circuit.recursion.predicates import own_control_ids
    from risc0_tpu.zkvm.receipt import VerifierContext

    _ids, root = own_control_ids()
    return VerifierContext(control_root=root)


def seg_step(po2, povw=False, n_segments=1, fill=0.70):
    """Execute the loop guest and prove segment(s) at the target po2."""
    from risc0_tpu.circuit.rv32im.claim import decode_claim
    from risc0_tpu.circuit.rv32im.prove import prove_segment
    from risc0_tpu.circuit.rv32im.verify import verify_rv32im_seal
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl
    from risc0_tpu.zkvm.receipt import SegmentReceipt

    count = _count_for_po2(po2, fill=fill * n_segments)
    kw = {}
    if povw:
        from risc0_tpu.zkvm.povw import PovwJobId
        kw["povw_job_id"] = PovwJobId(
            log=int.from_bytes(b"\x11" * 20, "little"), job=7)
    env = ExecutorEnv(segment_po2=po2, **kw).write_slice(
        count.to_bytes(4, "little"))
    elf = open(LOOP, "rb").read()
    session = ExecutorImpl(env, elf).run()
    assert len(session.segments) >= n_segments, \
        f"wanted {n_segments} segments, got {len(session.segments)}"
    rng = np.random.default_rng(7)
    out = []
    for seg in session.segments[:n_segments]:
        assert seg.po2 == po2, f"segment po2 {seg.po2} != target {po2}"
        seal = prove_segment(seg, rng=rng)
        verify_rv32im_seal(seal)
        out.append(SegmentReceipt(seal=np.asarray(seal, np.uint32), index=seg.index,
                                  hashfn="poseidon2",
                                  claim=decode_claim(seal)))
    return out


def lift_step(segs, povw=False, index=0):
    from risc0_tpu.zkvm import recursion_driver as RD

    sr = segs[index]
    receipt = RD.lift_povw(sr) if povw else RD.lift(sr)
    receipt.verify_integrity(_ctx())
    return receipt


def conditional_step(po2=16, povw=False, assume="lift_rv32im_14"):
    """A segment whose guest records an assumption via verify_integrity2
    (head assumption = a prior lift artifact's claim, 'self' zero root)."""
    from risc0_tpu.circuit.rv32im.claim import decode_claim
    from risc0_tpu.circuit.rv32im.prove import prove_segment
    from risc0_tpu.circuit.rv32im.verify import verify_rv32im_seal
    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl
    from risc0_tpu.zkvm.guest import Asm
    from risc0_tpu.zkvm.receipt import SegmentReceipt

    assumption = _load(assume)
    claim_digest = np.asarray(assumption.claim.digest(), np.uint32)
    root = np.zeros(8, np.uint32)

    a = Asm()
    tok = a.put_data(b"risc0_zkvm_platform::syscall::nr::"
                     b"SYS_VERIFY_INTEGRITY2\0")
    buf = a.put_data(claim_digest.tobytes() + root.tobytes())
    a.syscall("SYS_VERIFY_INTEGRITY2", tok, 0, 0, args=[buf, 64])
    a.halt(0)

    kw = {}
    if povw:
        from risc0_tpu.zkvm.povw import PovwJobId
        kw["povw_job_id"] = PovwJobId(
            log=int.from_bytes(b"\x22" * 20, "little"), job=9)
    env = ExecutorEnv(segment_po2=po2, **kw)
    session = ExecutorImpl(env, a.link()).run()
    assert len(session.assumptions_used) == 1
    rng = np.random.default_rng(8)
    seg = session.segments[0]
    seal = prove_segment(seg, rng=rng)
    verify_rv32im_seal(seal)
    # resolve needs the claim's Output UNPRUNED (assumption list visible),
    # so build the session-derived claim instead of decoding the (pruned)
    # seal globals; digests must agree.
    from risc0_tpu.zkvm.claims import ExitCode
    from risc0_tpu.zkvm.receipt import segment_claim, session_segment_output
    kind, *rest = session.exit_code
    sess_exit = ExitCode(kind, rest[0] if rest else 0)
    claim = segment_claim(seg, True, sess_exit,
                          session_segment_output(session))
    dec = decode_claim(seal)
    assert np.array_equal(claim.digest(), dec.digest()), \
        "session-derived claim != seal claim"
    return [SegmentReceipt(seal=np.asarray(seal, np.uint32),
                           index=seg.index, hashfn="poseidon2",
                           claim=claim)]


def keccak_step(po2):
    from risc0_tpu.circuit.keccak import prove_keccak

    rng = np.random.default_rng(po2)
    inputs = [[int(x) for x in rng.integers(0, 1 << 64, 25,
                                            dtype=np.uint64)]]
    return np.asarray(prove_keccak(inputs, po2), np.uint32)


def keccak_lift_step(po2):
    from risc0_tpu.zkvm import recursion_driver as RD

    seal = _load(f"keccak_{po2}")
    receipt = RD.lift_keccak(seal, po2)
    receipt.verify_integrity(_ctx())
    return receipt


def build_steps(big=False):
    """Return ordered [(name, fn)] covering every shipped program.

    Ordering is compile-cache-aware (the axon remote compile service is
    ~1 graph/min cold): everything that can run against the BASE po2
    (default 16 — the size bench.py warms first) goes first, so one
    rv32im compile block + one recursion-circuit compile block unlock
    every predicate program; per-po2 lift coverage at the other sizes
    follows, each paying its own rv32im compile block; keccak last.
    Override the base with RISC0_BOOT_BASE_PO2.
    """
    from risc0_tpu.zkvm import recursion_driver as RD

    steps = []
    B = int(os.environ.get("RISC0_BOOT_BASE_PO2", "16"))
    po2s = list(range(14, 21)) + ([21, 22] if big else [])
    assert B in po2s

    # --- base-po2 block: every predicate program, warm shapes first ---
    steps.append((f"seg_{B}", lambda: seg_step(B)))
    steps.append((f"lift_rv32im_{B}",
                  lambda: lift_step(_load(f"seg_{B}"))))
    steps.append((f"seg_povw_{B}", lambda: seg_step(B, povw=True)))
    steps.append((f"lift_rv32im_povw_{B}",
                  lambda: lift_step(_load(f"seg_povw_{B}"), povw=True)))

    # join/union over a real 2-segment session at the base po2
    steps.append((f"seg2_{B}",
                  lambda: seg_step(B, n_segments=2, fill=0.75)))
    steps.append((f"lift2_{B}a",
                  lambda: lift_step(_load(f"seg2_{B}"), index=0)))
    steps.append((f"lift2_{B}b",
                  lambda: lift_step(_load(f"seg2_{B}"), index=1)))

    def join_step():
        r = RD.join(_load(f"lift2_{B}a"), _load(f"lift2_{B}b"))
        r.verify_integrity(_ctx())
        return r
    steps.append(("join", join_step))

    def union_step():
        r = RD.union(_load(f"lift_rv32im_{B}"), _load(f"lift2_{B}a"))
        r.verify_integrity(_ctx())
        return r
    steps.append(("union", union_step))

    # resolve: conditional (verify2 guest) + assumption = base lift
    steps.append(("seg_cond",
                  lambda: conditional_step(po2=B,
                                           assume=f"lift_rv32im_{B}")))
    steps.append(("lift_cond", lambda: lift_step(_load("seg_cond"))))

    def resolve_step():
        r = RD.resolve(_load("lift_cond"), _load(f"lift_rv32im_{B}"))
        r.verify_integrity(_ctx())
        return r
    steps.append(("resolve", resolve_step))

    # povw join / unwrap chains (2-segment povw session at base po2)
    steps.append((f"seg2_povw_{B}",
                  lambda: seg_step(B, povw=True, n_segments=2, fill=0.75)))
    steps.append((f"lift2_povw_{B}a",
                  lambda: lift_step(_load(f"seg2_povw_{B}"), povw=True,
                                    index=0)))
    steps.append((f"lift2_povw_{B}b",
                  lambda: lift_step(_load(f"seg2_povw_{B}"), povw=True,
                                    index=1)))

    def join_povw_step(unwrap=False):
        r = RD.join_povw(_load(f"lift2_povw_{B}a"),
                         _load(f"lift2_povw_{B}b"), unwrap=unwrap)
        r.verify_integrity(_ctx())
        return r
    steps.append(("join_povw", join_povw_step))
    steps.append(("join_unwrap_povw", lambda: join_povw_step(unwrap=True)))

    def unwrap_step():
        r = RD.unwrap_povw(_load("join_povw"))
        r.verify_integrity(_ctx())
        return r
    steps.append(("unwrap_povw", unwrap_step))

    # resolve_povw: conditional under a povw job + plain assumption
    steps.append(("seg_cond_povw",
                  lambda: conditional_step(po2=B, povw=True,
                                           assume=f"lift_rv32im_{B}")))
    steps.append(("lift_cond_povw",
                  lambda: lift_step(_load("seg_cond_povw"), povw=True)))

    def resolve_povw_step(unwrap=False):
        r = RD.resolve_povw(_load("lift_cond_povw"),
                            _load(f"lift_rv32im_{B}"), unwrap=unwrap)
        r.verify_integrity(_ctx())
        return r
    steps.append(("resolve_povw", resolve_povw_step))
    steps.append(("resolve_unwrap_povw",
                  lambda: resolve_povw_step(unwrap=True)))

    def identity_step():
        from risc0_tpu.circuit.recursion.predicates import own_control_ids
        from risc0_tpu.zkvm.receipt import VerifierContext
        r = RD.identity_p254(_load(f"lift_rv32im_{B}"))
        _ids, p2_root = own_control_ids()
        r.verify_integrity(VerifierContext(
            hashfn="poseidon254", control_root=r.control_root,
            inner_control_root=p2_root))
        return r
    steps.append(("identity_p254", identity_step))

    # --- per-po2 lift coverage at the remaining sizes (bench.py's
    # ladder warms 18/20, so they go before the never-compiled sizes) ---
    rest = [p for p in (18, 20) if p in po2s and p != B]
    rest += [p for p in po2s if p != B and p not in rest]
    for po2 in rest:
        steps.append((f"seg_{po2}", lambda p=po2: seg_step(p)))
        steps.append((f"lift_rv32im_{po2}",
                      lambda p=po2: lift_step(_load(f"seg_{p}"))))
        steps.append((f"seg_povw_{po2}",
                      lambda p=po2: seg_step(p, povw=True)))
        steps.append((f"lift_rv32im_povw_{po2}",
                      lambda p=po2: lift_step(_load(f"seg_povw_{p}"),
                                              povw=True)))

    # --- keccak circuit + keccak_lift programs ---
    for po2 in range(14, 19):
        steps.append((f"keccak_{po2}", lambda p=po2: keccak_step(p)))
        steps.append((f"keccak_lift_{po2}",
                      lambda p=po2: keccak_lift_step(p)))
    return steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--big", action="store_true")
    ap.add_argument("--list", action="store_true")
    a = ap.parse_args()

    import jax
    if os.environ.get("RISC0_BOOT_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    steps = build_steps(big=a.big)
    if a.list:
        for name, _ in steps:
            print(name)
        return

    done = _done_steps()
    for name, fn in steps:
        if a.only and a.only not in name:
            continue
        if name in done and _have(name):
            print(f"skip     {name} (already PASS)", flush=True)
            continue
        t0 = time.time()
        try:
            art = fn()
            _save(name, art)
            dt = time.time() - t0
            _record(name, "PASS", dt)
            print(f"PASS     {name}  {dt:.1f}s", flush=True)
        except Exception as e:
            dt = time.time() - t0
            _record(name, "FAIL", dt, note=str(e)[:120].replace("|", "/"))
            print(f"FAIL     {name}  {dt:.1f}s  {e}", flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
