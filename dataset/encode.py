"""Offline unit extraction: HuBERT-soft units for every wav under a tree.

Reference parity (dataset/encode.py): saves ``<out>/<rel>.npy`` with the
(Frame, 256) unit series per wav. TPU-native: the flax HuBERT runs jitted
with shape bucketing (wav lengths padded up to 1 s steps) so the whole
dataset encodes with a handful of XLA compilations.

    python dataset/encode.py soft in-dir out-dir [--extension .wav]
                             [--suffix_16k] [--hubert path/to/hubert-soft.pt]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from quickvc_tpu.data.audio_io import read_wav, resample
from quickvc_tpu.models.hubert import HubertSoft


def encode_dataset(args):
    from convert import load_hubert_params

    hubert = HubertSoft()
    params = load_hubert_params(args.hubert)
    units_fn = jax.jit(lambda w: hubert.apply(params, w, method=HubertSoft.units))

    if args.suffix_16k:
        paths = sorted(Path(args.in_dir).glob("**/*.16k.wav"))
    else:
        paths = sorted(Path(args.in_dir).rglob(f"*{args.extension}"))
    print(f"Encoding {len(paths)} files from {args.in_dir}")

    bucket = 16000  # pad to whole seconds: bounded set of XLA shapes
    for in_path in paths:
        out_path = Path(args.out_dir) / in_path.relative_to(args.in_dir)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        wav, sr = read_wav(str(in_path))
        wav = resample(wav, sr, 16000)
        n = len(wav)
        padded = int(np.ceil(max(n, bucket) / bucket)) * bucket
        wav_p = np.zeros(padded, np.float32)
        wav_p[:n] = wav
        units = np.asarray(units_fn(jnp.asarray(wav_p[None])))[0]
        units = units[: n // 320]  # crop to true frame count
        np.save(out_path.with_suffix(".npy"), units.astype(np.float32))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Encode an audio dataset to HuBERT-soft units.")
    parser.add_argument("model", choices=["soft"])
    parser.add_argument("in_dir", metavar="in-dir", type=Path)
    parser.add_argument("out_dir", metavar="out-dir", type=Path)
    parser.add_argument("--extension", default=".wav", type=str)
    parser.add_argument("--suffix_16k", action="store_true")
    parser.add_argument("--hubert", default="logs/hubert-soft.pt", type=str)
    args = parser.parse_args()
    encode_dataset(args)
