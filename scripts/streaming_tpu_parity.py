"""On-TPU full-size streaming==batch conversion parity gate.

Reproducibly regenerates ``STREAMING_TPU_r{N}.json`` (round-4 verdict weak
item #5): drives the REAL ``convert.py`` CLI twice on the real chip at full
model size — once on the batch path, once with ``--streaming`` — over
deterministic 12-s utterances, and asserts the chunk interiors match the
batch path after trimming the streaming context + receptive-field margin
from each utterance edge. The round-5 ad-hoc run of this comparison found a
real bug (the old ``--context-frames 48`` default was below the full-size
~75-frame receptive field and silently diverged interiors); this script
makes that gate a one-command per-round artifact like
``scripts/pallas_tpu_parity.py``.

Reference anchor: the reference has no streaming path at all
(`/root/reference/convert.py:49-80` is whole-utterance only); streaming is
a capability we add, so it must be held to the batch path's numerics.

Run (default TPU env; ~10-15 min cold through the tunnel):

    nohup python scripts/streaming_tpu_parity.py --round <N> \
        > /tmp/streaming_parity.log 2>&1 &

Edges are excluded by construction: streaming pads the first/last chunk's
context with zeros while the batch path sees the true utterance edges, so
only the interior (one context + receptive field in from each edge) is
required to match. Measured bit-exact (max abs diff 0.0) on the chip in
round 5; the gate allows rel <= 1e-6 so a benign future change in XLA
scheduling does not flip the artifact red without a real numerics change.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def make_utterances(root: str, n: int, seconds: float, sr: int) -> list[str]:
    """Deterministic speech-band test signals (harmonic stacks + noise)."""
    from quickvc_tpu.data.audio_io import write_wav_int16

    rng = np.random.default_rng(1234)
    paths = []
    t = np.arange(int(seconds * sr)) / sr
    for i in range(n):
        f0 = 110.0 * (i + 1)
        w = sum(0.3 / (k + 1) * np.sin(2 * np.pi * f0 * (k + 1) * t
                                       + rng.uniform(0, 2 * np.pi))
                for k in range(4))
        # slow amplitude envelope so chunks see non-stationary signal
        w = w * (0.5 + 0.5 * np.sin(2 * np.pi * 0.7 * t + i))
        w = w + 0.02 * rng.standard_normal(t.size)
        p = os.path.join(root, f"st{i}.wav")
        write_wav_int16(p, w.astype(np.float32), sr)
        paths.append(p)
    return paths


def ensure_sandbox(root: str) -> None:
    """Full-size random G + HuBERT checkpoints (CPU subprocess, cached)."""
    if (os.path.exists(os.path.join(root, "G_synthetic.pth"))
            and os.path.exists(os.path.join(root, "hubert-soft.pt"))):
        return
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/make_verify_sandbox.py"),
         "--root", root],
        env=env, check=True)


def run_convert(extra: list[str], outdir: str, root: str, pairs: str) -> None:
    cmd = [sys.executable, os.path.join(REPO, "convert.py"),
           "--hpfile", os.path.join(REPO, "configs/quickvc.json"),
           "--ptfile", os.path.join(root, "G_synthetic.pth"),
           "--hubert", os.path.join(root, "hubert-soft.pt"),
           "--txtpath", pairs, "--outdir", outdir,
           "--noise-scale", "0"] + extra
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)  # default env: the real TPU


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--round", type=int, required=True)
    parser.add_argument("--sandbox", default="/tmp/qvc_verify",
                        help="dir holding/receiving the full-size synthetic "
                             "G_synthetic.pth + hubert-soft.pt")
    parser.add_argument("--work", default="/tmp/qvc_streaming_gate")
    parser.add_argument("--pairs", type=int, default=3)
    parser.add_argument("--seconds", type=float, default=12.0)
    parser.add_argument("--chunk-frames", type=int, default=96)
    parser.add_argument("--context-frames", type=int, default=None,
                        help="default: convert.py's own default (the value "
                             "under test)")
    parser.add_argument("--trim-frames", type=int, default=200,
                        help="frames removed from each utterance edge before "
                             "comparison (context + receptive field)")
    parser.add_argument("--rel-gate", type=float, default=1e-6)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    sr, hop = 16000, 320
    os.makedirs(args.work, exist_ok=True)
    ensure_sandbox(args.sandbox)
    wavs = make_utterances(args.work, args.pairs, args.seconds, sr)
    pairs_txt = os.path.join(args.work, "pairs.txt")
    with open(pairs_txt, "w") as f:
        for i, p in enumerate(wavs):
            # src == tgt is fine: the gate is batch-vs-streaming of the
            # SAME conversion, not conversion quality
            f.write(f"st{i}|{p}|{p}\n")

    out_b = os.path.join(args.work, "out_batch")
    out_s = os.path.join(args.work, "out_stream")
    stream_extra = ["--streaming", "--chunk-frames", str(args.chunk_frames)]
    if args.context_frames is not None:
        stream_extra += ["--context-frames", str(args.context_frames)]
    run_convert([], out_b, args.sandbox, pairs_txt)
    run_convert(stream_extra, out_s, args.sandbox, pairs_txt)

    from quickvc_tpu.data.audio_io import read_wav

    trim = args.trim_frames * hop
    report, ok = [], True
    for i in range(args.pairs):
        a, sra = read_wav(os.path.join(out_b, f"st{i}.wav"))
        b, srb = read_wav(os.path.join(out_s, f"st{i}.wav"))
        assert sra == srb == sr and a.shape == b.shape, (sra, srb, a.shape, b.shape)
        ai, bi = a[trim:-trim], b[trim:-trim]
        max_abs = float(np.abs(ai - bi).max())
        signal = float(np.abs(ai).max())
        rel = max_abs / (signal + 1e-9)
        passed = rel <= args.rel_gate
        ok &= passed
        report.append({"pair": f"st{i}.wav", "interior_samples": int(ai.size),
                       "signal_max": signal, "interior_max_abs_diff": max_abs,
                       "interior_rel": rel})
        print(f"[{'PASS' if passed else 'FAIL'}] st{i}: interior max_abs="
              f"{max_abs:.3e} rel={rel:.3e} over {ai.size} samples", flush=True)

    # the context under test must cover the receptive field or the gate is
    # vacuous — mirror the arithmetic pinned by tests/test_streaming.py
    import re
    ctx = args.context_frames
    if ctx is None:
        m = re.search(r'--context-frames", type=int, default=(\d+)',
                      open(os.path.join(REPO, "convert.py")).read())
        ctx = int(m.group(1))

    artifact = {
        "round": args.round, "device": "tpu", "full_size": True,
        "noise_scale": 0, "chunk_frames": args.chunk_frames,
        "context_frames": ctx,
        "note": f"interior ({args.trim_frames}-frame edge trim = context + "
                "receptive field) vs the batch path on the real chip; edges "
                "differ by construction (streaming pads context with zeros, "
                "batch sees true utterance edges). Regenerated by "
                "scripts/streaming_tpu_parity.py.",
        "pairs": report, "ok": bool(ok),
    }
    out = args.out or os.path.join(REPO, f"STREAMING_TPU_r{args.round:02d}.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(("OK" if ok else "FAILED") + f" -> {out}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
