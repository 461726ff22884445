"""`risc0-tpu new` project scaffolding (reference `cargo risczero new`,
/root/reference/risc0/cargo-risczero/src/commands/new.rs) and the factors
example guest (reference examples/factors)."""

import subprocess
import sys
from pathlib import Path

from risc0_tpu import cli

REPO = Path(__file__).resolve().parent.parent


def test_new_scaffolds_runnable_project(tmp_path):
    rc = cli.main(["new", "myproof", "--dest", str(tmp_path)])
    assert rc == 0
    root = tmp_path / "myproof"
    assert {p.name for p in root.iterdir()} == \
        {"guest.py", "host.py", "README.md"}
    out = subprocess.run(
        [sys.executable, "host.py"], cwd=root, capture_output=True,
        text=True, timeout=300,
        env={"PYTHONPATH": f"{REPO}:.", "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"})
    assert out.returncode == 0, out.stderr
    assert "journal: 42" in out.stdout
    assert "receipt verified" in out.stdout


def test_new_rejects_bad_names(tmp_path):
    assert cli.main(["new", "../evil", "--dest", str(tmp_path)]) == 1


def test_factors_guest_multiplies_u64_and_rejects_trivial():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "factors_example", REPO / "examples" / "factors.py")
    F = importlib.util.module_from_spec(spec)
    sys.modules["factors_example"] = F
    spec.loader.exec_module(F)

    from risc0_tpu.zkvm.exec import ExecutorEnv, ExecutorImpl

    elf = F.build_guest()
    fa, fb = 0xFFFF_FFFB, 0xFFFF_FFC5  # product needs the mulhu half
    env = ExecutorEnv(segment_po2=16).write_slice(
        fa.to_bytes(4, "little") + fb.to_bytes(4, "little"))
    sess = ExecutorImpl(env, elf).run()
    assert sess.exit_code == ("Halted", 0)
    assert int.from_bytes(bytes(sess.journal), "little") == fa * fb

    bad = ExecutorImpl(
        ExecutorEnv(segment_po2=16).write_slice(
            (0).to_bytes(4, "little") + fb.to_bytes(4, "little")), elf).run()
    assert bad.exit_code == ("Halted", 1)
