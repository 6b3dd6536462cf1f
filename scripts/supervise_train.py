#!/usr/bin/env python
"""Relaunching supervisor for long training runs.

Launches the given command (typically ``python train.py ...``) and
relaunches it whenever it exits with RESTART_EXIT_CODE (75) — the code
train.py returns after ``train.max_host_rss_gb`` tripped a *checkpointed*
restart request. Because resume is bit-exact (TPU_TRAJECTORY_r05.json;
tests/test_train_step.py::TestResumeTrajectory), the relaunch is
trajectory-free: the supervised run trains the same sequence of updates an
uninterrupted run would.

Why this exists: the round-5 durability flagship measured ~90 MB/step of
host RSS growth from the remote-tunnel client's H2D staging (environment,
not framework — a CPU-backend control run of the same loop is flat;
BENCH.md "Durability flagship"). The loss-free mitigation is a periodic
restart; this script automates it end to end with the loop's own
RSS-threshold exit. The reference has no equivalent — its week-long run
(reference README.md:49) relies on manual restarts via utils.py's
latest-checkpoint scan.

Usage:
    python scripts/supervise_train.py [--max-restarts N] \
        [--restart-on-crash] -- python train.py -c prod.json -m run ...

Exit code: the child's final exit code (0 on clean completion). Crashes
(any code other than 0/75) stop the supervisor unless --restart-on-crash,
which relaunches up to --max-restarts times — resume picks up the last
*finite* checkpoint, and the loop's own divergence abort (10 consecutive
unhealthy logged steps) prevents a crash-loop from burning a cluster on a
genuinely broken run.

SIGTERM/SIGINT are forwarded to the child so Ctrl-C / preemption stops the
whole tree; the supervisor then exits with the child's code.
"""

from __future__ import annotations

import argparse
import signal
import subprocess
import time

# Mirrors quickvc_tpu.train.telemetry.RESTART_EXIT_CODE (pinned equal by
# tests/test_supervise.py) — inlined so the supervisor never imports the
# package (whose train/__init__ pulls jax; the supervisor must stay a
# zero-dependency process wrapper).
RESTART_EXIT_CODE = 75


def log(msg: str) -> None:
    print(f"[supervise {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--max-restarts", type=int, default=100,
                        help="total relaunches allowed (default 100; a "
                             "5k-step session restarting every ~1k steps "
                             "uses 5)")
    parser.add_argument("--restart-on-crash", action="store_true",
                        help="also relaunch on a crash (non-zero exit other "
                             "than the restart code); resume picks up the "
                             "last checkpoint")
    parser.add_argument("cmd", nargs=argparse.REMAINDER,
                        help="-- python train.py ... (everything after --)")
    args = parser.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd[:1] == ["--"] else args.cmd
    if not cmd:
        parser.error("no command given; usage: supervise_train.py -- python train.py ...")

    restarts = 0
    child: subprocess.Popen | None = None

    def forward(signum, _frame):
        if child is not None and child.poll() is None:
            child.send_signal(signum)

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, forward)

    while True:
        log(f"launch #{restarts}: {' '.join(cmd)}")
        child = subprocess.Popen(cmd)
        try:
            code = child.wait()
        except KeyboardInterrupt:
            # forward() already delivered SIGINT to the child; collect it
            code = child.wait()
        if code == 0:
            log("child completed cleanly")
            return 0
        if code == RESTART_EXIT_CODE:
            reason = "checkpointed restart request"
        elif args.restart_on_crash:
            reason = f"crash (exit {code}), --restart-on-crash"
        else:
            log(f"child exited {code}; stopping (no --restart-on-crash)")
            return code
        restarts += 1
        if restarts > args.max_restarts:
            log(f"{reason} but --max-restarts={args.max_restarts} exhausted")
            return code
        log(f"{reason}; relaunching ({restarts}/{args.max_restarts})")


if __name__ == "__main__":
    raise SystemExit(main())
