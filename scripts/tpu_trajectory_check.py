"""On-chip bit-exact resume-trajectory check (VERDICT r4 item 1, last clause).

The CPU suite proves straight-run == save/restore-split trajectories
bit-exactly (tests/test_train_step.py::TestResumeTrajectory, 2-process
variant in tests/test_distributed.py). This script makes the same claim ON
THE REAL TPU at production shape, scaled down in steps:

  run A (straight): train.py --max-steps N           -> checkpoint at N
  run B (split):    train.py --max-steps M (M < N, mid-epoch), then
                    train.py --max-steps N           -> resumes at M with
                    the loader fast-forward, checkpoint at N

then restores both step-N checkpoints host-side and compares EVERY param /
AdamW-moment / counter leaf by sha256. Bit-equality on the chip pins down
determinism of the whole on-device pipeline (compact wire format, Pallas
spec kernel, bf16 step, donated buffers) across a checkpoint boundary —
not just the CPU emulation of it.

    nohup python scripts/tpu_trajectory_check.py --round 5 \
        --config /tmp/qvc_corpus/prod.json > /tmp/tpu_traj.log 2>&1 &

Writes TPU_TRAJECTORY_r{N}.json. Wall: ~3 backend inits + ~75 steps.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def _train(cfg_path: str, name: str, root: str, max_steps: int) -> None:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"), "-c", cfg_path,
         "-m", name, "-mr", root, "--max-steps", str(max_steps)],
        capture_output=True, text=True, timeout=3600)
    assert proc.returncode == 0, (
        f"{name} --max-steps {max_steps} failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-3000:]}")
    print(f"  {name} -> step {max_steps} in {time.time()-t0:.0f} s", flush=True)


def _state_hashes(cfg_path_archived: str, model_dir: str) -> dict[str, str]:
    """Restore the latest orbax checkpoint host-side; sha256 every leaf."""
    import numpy as np

    import jax

    from quickvc_tpu.config import load_config
    from quickvc_tpu.train.state import create_train_state
    from quickvc_tpu.utils.checkpoint import CheckpointManager

    cfg = load_config(cfg_path_archived)
    state, _, _ = create_train_state(cfg, jax.random.PRNGKey(cfg.train.seed))
    restored = CheckpointManager(model_dir).restore_latest(state)
    assert restored is not None, model_dir
    state, step = restored
    out = {"__step__": str(step)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(state):
        arr = np.asarray(jax.device_get(leaf))
        out[jax.tree_util.keystr(path)] = hashlib.sha256(
            arr.tobytes() + str(arr.dtype).encode()).hexdigest()
    return out


def main(args) -> int:
    shutil.rmtree(args.root, ignore_errors=True)
    os.makedirs(args.root)
    cfg = json.load(open(args.config))
    cfg["train"].update({"eval_interval": 0, "export_torch_every": 0,
                         "log_interval": 5})
    cfg_path = os.path.join(args.root, "traj.json")
    json.dump(cfg, open(cfg_path, "w"), indent=1)

    t0 = time.time()
    print(f"straight run: 0 -> {args.total_steps}", flush=True)
    _train(cfg_path, "straight", args.root, args.total_steps)
    print(f"split run: 0 -> {args.split_step} (mid-epoch), resume -> "
          f"{args.total_steps}", flush=True)
    _train(cfg_path, "split", args.root, args.split_step)
    _train(cfg_path, "split", args.root, args.total_steps)
    resumed_log = open(os.path.join(args.root, "split", "train.log")).read()
    assert f"Resumed from checkpoint at step {args.split_step}" in resumed_log

    # host-side hash comparison runs in a CPU subprocess (this process owns
    # no jax backend; children each had their own)
    this = os.path.abspath(__file__)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    cmp_out = subprocess.run(
        [sys.executable, this, "--round", str(args.round), "--config",
         args.config, "--root", args.root, "--split-step",
         str(args.split_step), "--total-steps", str(args.total_steps),
         "--_compare"],
        capture_output=True, text=True, env=env, timeout=1800)
    print(cmp_out.stdout[-4000:], flush=True)
    assert cmp_out.returncode == 0, cmp_out.stderr[-3000:]
    print(f"total {time.time()-t0:.0f} s", flush=True)
    return 0


def compare(args) -> int:
    a = _state_hashes(os.path.join(args.root, "straight", "config.json"),
                      os.path.join(args.root, "straight"))
    b = _state_hashes(os.path.join(args.root, "split", "config.json"),
                      os.path.join(args.root, "split"))
    assert a["__step__"] == b["__step__"], (a["__step__"], b["__step__"])
    diff = [k for k in a if a[k] != b.get(k)]
    ok = not diff
    out = {
        "round": args.round,
        "config": args.config,
        "split_step": args.split_step,
        "total_steps": args.total_steps,
        "n_leaves": len(a) - 1,
        "final_step": int(a["__step__"]),
        "mismatching_leaves": diff[:20],
        "bit_exact": ok,
    }
    path = os.path.join(REPO, f"TPU_TRAJECTORY_r{args.round:02d}.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}: {len(a)-1} leaves, "
          f"{'BIT-EXACT' if ok else f'{len(diff)} MISMATCHES'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--root", default="/tmp/qvc_traj")
    ap.add_argument("--split-step", type=int, default=15)
    ap.add_argument("--total-steps", type=int, default=30)
    ap.add_argument("--_compare", action="store_true")
    a = ap.parse_args()
    sys.exit(compare(a) if a._compare else main(a))
