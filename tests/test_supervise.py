"""Supervisor + host-RSS restart machinery (scripts/supervise_train.py,
train/telemetry.py:host_rss_gb/HostMemoryRestart).

The reference's week-long run (reference README.md:49) relies on manual
restarts; our loop turns host memory pressure into a *checkpointed* restart
request (exit 75) and the supervisor relaunches — loss-free because resume
is bit-exact (TestResumeTrajectory). The loop-level trip test lives in
tests/test_e2e.py::test_rss_limit_checkpoints_then_requests_restart (it
needs the synthetic-corpus fixtures); this file covers the pieces that run
without jax compiles.
"""

import importlib.util
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUPERVISE = os.path.join(REPO, "scripts", "supervise_train.py")


def _load_supervise():
    spec = importlib.util.spec_from_file_location("supervise_train", SUPERVISE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_restart_exit_code_pinned_across_modules():
    """The supervisor inlines the code (it must not import jax via the
    package); this pin is what keeps the two definitions equal."""
    from quickvc_tpu.train.telemetry import RESTART_EXIT_CODE

    assert _load_supervise().RESTART_EXIT_CODE == RESTART_EXIT_CODE == 75


def test_host_rss_gb_sane():
    from quickvc_tpu.train.telemetry import host_rss_gb

    rss = host_rss_gb()
    # a live pytest+jax process holds hundreds of MB; a box has < 10 TB
    assert 0.05 < rss < 10_000


def test_host_memory_restart_message():
    from quickvc_tpu.train.telemetry import HostMemoryRestart

    e = HostMemoryRestart(12.5, 10.0, 420)
    assert e.rss_gb == 12.5 and e.limit_gb == 10.0 and e.step == 420
    assert "12.50" in str(e) and "420" in str(e) and "75" in str(e)


# Counter-file child: exits 75 (restart-requested) on its first N runs,
# then 0 — the shape of a run that trips max_host_rss_gb twice and then
# completes.
CHILD = (
    "import sys; from pathlib import Path; p = Path(sys.argv[1]); "
    "n = int(p.read_text()) if p.exists() else 0; p.write_text(str(n + 1)); "
    "sys.exit(75 if n < {k} else 0)"
)


def _run_supervisor(extra, child_code, counter):
    return subprocess.run(
        [sys.executable, SUPERVISE, *extra, "--",
         sys.executable, "-c", child_code, str(counter)],
        capture_output=True, text=True, timeout=120)


def test_supervisor_relaunches_on_restart_code(tmp_path):
    counter = tmp_path / "launches"
    r = _run_supervisor([], CHILD.format(k=2), counter)
    assert r.returncode == 0, r.stdout + r.stderr
    assert counter.read_text() == "3"  # 2 restart-requesting runs + final
    assert r.stdout.count("checkpointed restart request") == 2


def test_supervisor_stops_on_crash_by_default(tmp_path):
    counter = tmp_path / "launches"
    crash = ("import sys; from pathlib import Path; p = Path(sys.argv[1]); "
             "n = int(p.read_text()) if p.exists() else 0; "
             "p.write_text(str(n + 1)); sys.exit(3)")
    r = _run_supervisor([], crash, counter)
    assert r.returncode == 3
    assert counter.read_text() == "1"  # no relaunch without the flag


def test_supervisor_restart_on_crash_bounded(tmp_path):
    counter = tmp_path / "launches"
    crash = ("import sys; from pathlib import Path; p = Path(sys.argv[1]); "
             "n = int(p.read_text()) if p.exists() else 0; "
             "p.write_text(str(n + 1)); sys.exit(3)")
    r = _run_supervisor(["--restart-on-crash", "--max-restarts", "2"],
                        crash, counter)
    assert r.returncode == 3
    assert counter.read_text() == "3"  # initial + 2 allowed relaunches


def test_supervisor_requires_command():
    r = subprocess.run([sys.executable, SUPERVISE], capture_output=True,
                       text=True, timeout=60)
    assert r.returncode == 2 and "no command" in r.stderr


def test_train_py_maps_restart_to_exit_75(tmp_path, monkeypatch):
    """train.py converts HostMemoryRestart from run() into SystemExit(75)
    (the supervisor contract) without re-raising the exception."""
    import train as train_cli
    from quickvc_tpu.train import loop as loop_mod
    from quickvc_tpu.train.telemetry import HostMemoryRestart

    def fake_run(cfg, **kw):
        raise HostMemoryRestart(9.9, 1.0, 7)

    monkeypatch.setattr(loop_mod, "run", fake_run)
    monkeypatch.setattr(sys, "argv", [
        "train.py", "-c", os.path.join(REPO, "configs", "quickvc.json"),
        "-m", "sup_exit_test", "-mr", str(tmp_path)])
    with pytest.raises(SystemExit) as exc:
        train_cli.main()
    assert exc.value.code == 75
