"""Driver-bench plumbing tests (fake child mode — no proving).

The driver runs `python bench.py` with a hard wall-clock budget and
records the LAST JSON line; these tests pin the budget-aware ladder
behavior that keeps BENCH_r*.json populated (VERDICT r4 item 1;
reference analog: the datasheet harness always emits its rows,
risc0/zkvm/examples/datasheet.rs:98-143).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(env_extra, timeout=120):
    env = dict(os.environ, RISC0_BENCH_CPU="1", **env_extra)
    r = subprocess.run([sys.executable, BENCH], capture_output=True,
                       text=True, timeout=timeout, env=env, cwd=REPO)
    lines = [json.loads(ln) for ln in r.stdout.splitlines()
             if ln.startswith("{")]
    return r.returncode, lines


def test_ladder_emits_one_line_per_po2():
    rc, lines = _run({"RISC0_BENCH_FAKE": "1",
                      "RISC0_BENCH_PO2S": "16,18,20"})
    assert rc == 0
    assert [l["detail"]["po2"] for l in lines] == [16, 18, 20]


def test_child_failure_still_exits_zero_with_fallback_line():
    rc, lines = _run({"RISC0_BENCH_FAKE": "fail"})
    assert rc == 0
    assert lines, "must always emit at least one JSON line"
    assert lines[-1]["value"] == 0 and "error" in lines[-1]["detail"]


def test_cap_timeout_retries_same_size(tmp_path):
    # BENCH_r05 regression: a first-attempt cap blow (cold compiles) must
    # RETRY the size — the persistent compile cache makes the retry
    # resume — not abandon the ladder with budget left
    marker = str(tmp_path / "attempt1")
    rc, lines = _run({"RISC0_BENCH_FAKE": "timeout_once",
                      "RISC0_BENCH_FAKE_MARKER": marker,
                      "RISC0_BENCH_PO2S": "16",
                      "RISC0_BENCH_CAP_S": "3"}, timeout=180)
    assert rc == 0
    assert lines and lines[-1]["detail"]["po2"] == 16
    assert os.path.exists(marker), "first attempt must have run"


def test_budget_cuts_ladder_but_keeps_emitted_lines():
    # child sleeps 10s; budget allows ~ one 120s-floor cap then exhausts
    rc, lines = _run({"RISC0_BENCH_FAKE": "1",
                      "RISC0_BENCH_FAKE_SLEEP": "10",
                      "RISC0_BENCH_PO2S": "16,18",
                      "RISC0_BENCH_BUDGET_S": "155"})
    assert rc == 0
    assert lines and lines[0]["detail"]["po2"] == 16
    # po2=18's cap would be under the 120s floor -> ladder stops, but the
    # po2=16 line survives as the last parseable record
    assert lines[-1]["detail"].get("po2") == 16
