"""Corpus-scale synthetic multi-speaker dataset (VERDICT r3 items 1 + 6).

Generates a few thousand synthetic utterances spanning ALL bucket
boundaries (train/loop.py BUCKET_BOUNDARIES) across N distinct "speakers"
(each a fixed spectral envelope + f0 range, so the speaker encoder has real
speaker structure to embed), then drives the REAL offline pipeline over it:

    raw/ (mixed 16k/22k05 s16 wav)
      -> downsample.py   (trim/normalize/resample; the reference's
                          downsample.py equivalent)
      -> dataset/encode.py (full 94M HuBERT-soft, seeded random weights —
                          the pretrained checkpoint is not fetchable
                          offline; run on the TPU)
      -> train.py        (production shape: batch 64 x 512-frame crops)

Filelists written:
- ``train_all.txt``  — every utterance (all buckets; loader rehearsal)
- ``train_prod.txt`` — only utterances > ``--prod-min-frames`` frames
  (default 512): every batch crops to the SAME 512-frame static shape, so
  the b64 production-throughput run pays exactly one train-step compile
  while still spanning several buckets (600..1000).
- ``prod.json`` / ``all.json`` — full-size configs over those lists.

Utterance lengths are snapped to whole seconds so dataset/encode.py's 1-s
shape bucketing compiles a bounded set of HuBERT programs (~12 lengths for
the whole corpus).

Generation is host-only numpy:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/make_corpus.py --root /tmp/qvc_corpus

Then (default TPU env):

    python downsample.py --in-dir /tmp/qvc_corpus/raw --out-dir /tmp/qvc_corpus/data
    python dataset/encode.py soft /tmp/qvc_corpus/data /tmp/qvc_corpus/data \
        --hubert /tmp/qvc_corpus/hubert-soft.pt
    python train.py -c /tmp/qvc_corpus/prod.json -m prod -mr /tmp/qvc_corpus/logs \
        --max-steps 520
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)

# seconds per utterance -> lands in bucket (frames = 50/s after downsample
# trims a hair off the edges). Short lengths cover the low buckets; >= 11 s
# covers every crop-512 bucket (560..1000 frames).
SHORT_SECONDS = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
LONG_SECONDS = [12, 14, 16, 18, 20]


def _speaker_bank(n_speakers: int, seed: int, sr: int):
    """Per-speaker fixed voice identity: f0 base + smooth spectral envelope."""
    rng = np.random.default_rng(seed)
    speakers = []
    for _ in range(n_speakers):
        f0 = float(np.exp(rng.uniform(np.log(85.0), np.log(255.0))))
        # smooth random log-spectral envelope as a 128-tap zero-phase FIR
        n_env = 33
        logmag = rng.standard_normal(n_env) * 1.2
        k = np.hanning(7)
        logmag = np.convolve(logmag, k / k.sum(), mode="same")
        mag = np.exp(logmag)
        fir = np.fft.irfft(mag, 2 * (n_env - 1))
        fir = np.roll(fir, n_env - 1) * np.hanning(2 * (n_env - 1))
        breath = float(rng.uniform(0.02, 0.12))
        speakers.append((f0, fir.astype(np.float32), breath))
    return speakers


def synth_utterance(speaker, seconds: float, sr: int,
                    rng: np.random.Generator) -> np.ndarray:
    """Speech-like signal: alternating voiced syllables (pulse train at a
    wandering f0 through the speaker's envelope filter, per-syllable
    formant-ish band emphasis) and unvoiced fricative bursts, with
    attack/decay envelopes and inter-word dips.

    The round-4 v1 generator (continuous harmonic tone + sinusoidal AM)
    produced audio degenerate enough that the GAN diverged instantly at
    the reference's lr=2e-4 while real speech trains cleanly (BENCH.md
    forensics); this version restores the aperiodic/voiced alternation
    and spectral movement real speech has.
    """
    from scipy.signal import lfilter

    f0_base, fir, breath = speaker
    n = int(seconds * sr)
    sig = np.zeros(n, np.float32)
    pos = 0
    while pos < n:
        dur = int(sr * rng.uniform(0.10, 0.28))
        dur = min(dur, n - pos)
        t = np.arange(dur, dtype=np.float32) / sr
        voiced = rng.random() < 0.72
        if voiced:
            f0 = f0_base * np.exp(rng.uniform(-0.25, 0.25)
                                  + np.cumsum(rng.standard_normal(dur))
                                  * 0.3 / sr
                                  + 0.01 * np.sin(2 * np.pi * 5.0 * t))
            phase = np.cumsum(f0) / sr
            saw = (phase % 1.0).astype(np.float32)
            src = (saw ** 6 - 1.0 / 7.0).astype(np.float32)
            # moving formant-ish emphasis: mix in a band of shaped noise
            src += 0.15 * rng.standard_normal(dur).astype(np.float32)
            seg = lfilter(fir, [1.0], src).astype(np.float32)
        else:
            # fricative/plosive: high-passed noise burst
            noise = rng.standard_normal(dur + 1).astype(np.float32)
            seg = (noise[1:] - rng.uniform(0.5, 0.95) * noise[:-1])
            seg = lfilter(fir[::-1], [1.0], seg).astype(np.float32) * 0.6
        # attack/decay inside the syllable; floor keeps trim_silence happy
        env = np.minimum(1.0, np.minimum(t / 0.02, (t[-1] - t + 1e-3) / 0.05))
        amp = rng.uniform(0.45, 1.0) * (0.35 + 0.65 * env)
        sig[pos : pos + dur] = seg * amp.astype(np.float32)
        pos += dur
        # short inter-word dip (kept above the -20 dB trim threshold by
        # breath noise below)
        gap = int(sr * rng.uniform(0.0, 0.06))
        pos += min(gap, max(0, n - pos))
    sig += breath * rng.standard_normal(n).astype(np.float32)
    return (0.8 * sig / (np.abs(sig).max() + 1e-9)).astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/qvc_corpus")
    parser.add_argument("--n-speakers", type=int, default=12)
    parser.add_argument("--n-short", type=int, default=700,
                        help="utterances spread over 1..10 s (all low buckets)")
    parser.add_argument("--n-long", type=int, default=1300,
                        help="utterances spread over 12..20 s (crop-512 buckets)")
    parser.add_argument("--prod-min-frames", type=int, default=512)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--raw-22k-fraction", type=float, default=0.1,
                        help="fraction generated at 22.05 kHz so downsample.py "
                             "exercises real resampling at scale")
    args = parser.parse_args()
    root = args.root

    from quickvc_tpu.data.audio_io import write_wav_int16

    rng = np.random.default_rng(args.seed)
    speakers = _speaker_bank(args.n_speakers, args.seed + 1, 16000)

    jobs = []  # (seconds, speaker_idx)
    for i in range(args.n_short):
        jobs.append((SHORT_SECONDS[i % len(SHORT_SECONDS)], i % args.n_speakers))
    for i in range(args.n_long):
        jobs.append((LONG_SECONDS[i % len(LONG_SECONDS)], (i * 7 + 3) % args.n_speakers))

    total_s = 0.0
    for u, (seconds, spk) in enumerate(jobs):
        sr = 22050 if rng.random() < args.raw_22k_fraction else 16000
        wav = synth_utterance(speakers[spk], seconds, sr, rng)
        out = os.path.join(root, "raw", f"spk{spk:02d}", f"utt{u:05d}.wav")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        write_wav_int16(out, wav, sr)
        total_s += seconds
        if (u + 1) % 500 == 0:
            print(f"  generated {u + 1}/{len(jobs)} utterances")

    # Seeded full-size HuBERT checkpoint for dataset/encode.py (the real
    # pretrained weights are not fetchable offline; deterministic random
    # weights are still a content-dependent featurizer — BENCH.md
    # "Real-unit run").
    hubert_path = os.path.join(root, "hubert-soft.pt")
    if not os.path.exists(hubert_path):
        import torch

        sys.path.insert(0, os.path.join(REPO, "tests"))
        from ref_convert_harness import TorchHubertSoft

        torch.manual_seed(5)
        torch.save({"hubert": TorchHubertSoft().state_dict()}, hubert_path)

    # Filelists refer to the post-downsample tree (root/data). Frame count
    # after trim ~= seconds*50 minus a few edge frames; use a conservative
    # threshold so every prod utterance crops at the full 512 frames.
    data = lambda u, spk: os.path.join(  # noqa: E731
        root, "data", f"spk{spk:02d}", f"utt{u:05d}.wav")
    all_paths = [data(u, spk) for u, (_, spk) in enumerate(jobs)]
    prod_paths = [data(u, spk) for u, (seconds, spk) in enumerate(jobs)
                  if seconds * 50 - 25 > args.prod_min_frames]
    with open(os.path.join(root, "train_all.txt"), "w") as f:
        f.writelines(p + "\n" for p in all_paths)
    with open(os.path.join(root, "train_prod.txt"), "w") as f:
        f.writelines(p + "\n" for p in prod_paths)

    base = json.load(open(os.path.join(REPO, "configs/quickvc.json")))
    for name, lst, extra in (
        ("prod", "train_prod.txt", {"batch_size": args.batch_size,
                                    "log_interval": 20, "eval_interval": 0}),
        ("all", "train_all.txt", {"batch_size": args.batch_size,
                                  "log_interval": 20, "eval_interval": 0}),
    ):
        cfg = json.loads(json.dumps(base))
        cfg["train"].update(extra)
        cfg["data"].update({
            "training_files": os.path.join(root, lst),
            "validation_files": os.path.join(root, lst),
        })
        json.dump(cfg, open(os.path.join(root, f"{name}.json"), "w"), indent=1)

    print(f"corpus: {len(jobs)} utterances, {total_s / 3600:.2f} h audio, "
          f"{args.n_speakers} speakers under {root}; prod list "
          f"{len(prod_paths)} files")


if __name__ == "__main__":
    main()
