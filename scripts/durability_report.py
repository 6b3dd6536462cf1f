"""Summarize a durability run (VERDICT r4 item 1) into DURABILITY_r{N}.json.

Pulls together, from a train.py run directory + the side monitor log:

- step-wall distribution (median/p95/max) from the TensorBoard
  ``time/step_*`` scalars the loop now emits (train/telemetry.py), plus
  stall-warning lines from train.log;
- loss trajectory (g/d/mel/kl first vs last logged step) and eval
  ``eval/mel_l1`` / ``eval/vc_spk_sim`` / ``eval/vc_spk_margin`` trends;
- host RSS start/peak/end from the monitor log (kB samples);
- checkpoint-directory state (rotation: which steps remain), exported
  reference-layout G_*/D_*.pth files;
- kill/resume forensics: every "Resumed from checkpoint at step N" line
  and the losses logged immediately around the kill boundary.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/durability_report.py --round 5 \
        --model-dir /tmp/qvc_corpus/logs/durability \
        --rss-log /tmp/durability_rss.log
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

STEP_RE = re.compile(
    r"epoch (\d+) step (\d+) lr ([\d.e+-]+) \| g ([\d.naninf+-]+) "
    r"d ([\d.naninf+-]+) mel ([\d.naninf+-]+) kl ([\d.naninf+-]+) "
    r"\(([\d.]+) s since last log\)")


def scalars_from_tb(logdir: str, tags: list[str]) -> dict[str, list]:
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    out: dict[str, list] = {t: [] for t in tags}
    for ev_file_dir in {logdir}:
        acc = EventAccumulator(ev_file_dir,
                               size_guidance={"scalars": 0})
        acc.Reload()
        for t in tags:
            if t in acc.Tags().get("scalars", []):
                out[t].extend((s.step, s.value) for s in acc.Scalars(t))
    for t in tags:
        out[t].sort()
    return out


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--round", type=int, required=True)
    parser.add_argument("--model-dir", required=True)
    parser.add_argument("--rss-log", default=None)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    md = args.model_dir

    log = open(os.path.join(md, "train.log")).read()
    steps = [(int(m.group(2)), float(m.group(4)), float(m.group(5)),
              float(m.group(6)), float(m.group(7)), float(m.group(8)))
             for m in STEP_RE.finditer(log)]
    resumes = [int(m.group(1)) for m in
               re.finditer(r"Resumed from checkpoint at step (\d+)", log)]
    stalls = re.findall(r"stall: steps (\d+)-\d+ mean wall ([\d.]+) s", log)
    unhealthy = len(re.findall(r"unhealthy step", log))

    tb = scalars_from_tb(md, ["time/step_p50", "time/step_p95",
                              "time/step_max"])
    tb_eval = scalars_from_tb(os.path.join(md, "eval"),
                              ["eval/mel_l1", "eval/spk_sim",
                               "eval/vc_spk_sim", "eval/vc_spk_margin"])

    p50s = [v for _, v in tb["time/step_p50"]]
    p95s = [v for _, v in tb["time/step_p95"]]
    maxs = [v for _, v in tb["time/step_max"]]
    # drop the first log window (contains the initial compile)
    body = slice(1, None)

    rss = {}
    if args.rss_log and os.path.exists(args.rss_log):
        kb = [int(m.group(1)) for m in
              re.finditer(r"VmRSS:\s+(\d+) kB", open(args.rss_log).read())]
        if kb:
            rss = {"start_mb": kb[0] // 1024, "peak_mb": max(kb) // 1024,
                   "end_mb": kb[-1] // 1024,
                   "growth_mb": (kb[-1] - kb[0]) // 1024,
                   "samples": len(kb)}

    ckpts = sorted(int(d) for d in
                   os.listdir(os.path.join(md, "checkpoints"))
                   if d.isdigit()) if os.path.isdir(
                       os.path.join(md, "checkpoints")) else []
    exports = sorted(os.path.basename(p) for p in
                     glob.glob(os.path.join(md, "[GD]_*.pth")))

    first, last = (steps[0], steps[-1]) if steps else (None, None)
    out = {
        "round": args.round,
        "model_dir": md,
        "logged_steps": len(steps),
        "first_step": {"step": first[0], "g": first[1], "d": first[2],
                       "mel": first[3], "kl": first[4]} if first else None,
        "last_step": {"step": last[0], "g": last[1], "d": last[2],
                      "mel": last[3], "kl": last[4]} if last else None,
        "losses_all_finite": bool(steps) and bool(
            np.isfinite([s[1:5] for s in steps]).all()),
        "unhealthy_logged_steps": unhealthy,
        "step_wall": {
            "p50_median": float(np.median(p50s[body])) if len(p50s) > 1 else None,
            "p95_median": float(np.median(p95s[body])) if len(p95s) > 1 else None,
            "p50_worst_window": float(max(p50s[body])) if len(p50s) > 1 else None,
            "max_overall": float(max(maxs[body])) if len(maxs) > 1 else None,
            "windows": len(p50s),
        },
        "stall_warnings": [{"step": int(s), "wall_s": float(w)}
                           for s, w in stalls],
        "resumes": resumes,
        "rss": rss,
        "checkpoints_present": ckpts,
        "torch_exports": exports,
        "eval": {t: [(int(s), round(float(v), 4)) for s, v in vals]
                 for t, vals in tb_eval.items()},
    }
    path = args.out or os.path.join(REPO, f"DURABILITY_r{args.round:02d}.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "eval"}, indent=1))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
