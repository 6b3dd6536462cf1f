"""Offline unit extraction: HuBERT-soft units for every wav under a tree.

Reference parity (dataset/encode.py): saves ``<out>/<rel>.npy`` with the
(Frame, 256) unit series per wav. TPU-native: the flax HuBERT runs jitted
with shape bucketing (wav lengths padded up to 1 s steps) so the whole
dataset encodes with a handful of XLA compilations, and same-bucket files
are batched through one forward (``--batch``, default 16) — the reference
encodes strictly one file per forward (dataset/encode.py:25-38).

    python dataset/encode.py soft in-dir out-dir [--extension .wav]
                             [--suffix_16k] [--hubert path/to/hubert-soft.pt]
                             [--batch 16]
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
    from quickvc_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    hubert = HubertSoft(front_mode=args.hubert_front)
    params = load_hubert_params(args.hubert)
    units_fn = jax.jit(lambda p, w: hubert.apply(p, w, method=HubertSoft.units))

    if args.suffix_16k:
        paths = sorted(Path(args.in_dir).glob("**/*.16k.wav"))
    else:
        paths = sorted(Path(args.in_dir).rglob(f"*{args.extension}"))
    print(f"Encoding {len(paths)} files from {args.in_dir}")

    bucket = 16000  # pad to whole seconds: bounded set of XLA shapes

    def flush(group: list[tuple[Path, np.ndarray]], padded: int) -> None:
        """One batched forward over same-bucket files; crop + save each.

        The batch dim is padded up to ``--batch`` so XLA compiles exactly
        one program per bucket length (a ragged final group would otherwise
        trigger its own compile).
        """
        batch = np.zeros((args.batch, padded), np.float32)
        for i, (_, wav) in enumerate(group):
            batch[i, : len(wav)] = wav
        units = np.asarray(units_fn(params, jnp.asarray(batch)))
        for i, (out_path, wav) in enumerate(group):
            out_path.parent.mkdir(parents=True, exist_ok=True)
            np.save(out_path.with_suffix(".npy"),
                    units[i, : len(wav) // 320].astype(np.float32))

    # Group same-padded-length files into batches: each group runs as ONE
    # jitted forward on (batch, padded) — the TPU is batch-starved at 1.
    groups: dict[int, list[tuple[Path, np.ndarray]]] = {}
    for in_path in paths:
        out_path = Path(args.out_dir) / in_path.relative_to(args.in_dir)
        wav, sr = read_wav(str(in_path))
        wav = resample(wav, sr, 16000)
        padded = int(np.ceil(max(len(wav), bucket) / bucket)) * bucket
        groups.setdefault(padded, []).append((out_path, wav))
        if len(groups[padded]) >= args.batch:
            flush(groups.pop(padded), padded)
    for padded, group in sorted(groups.items()):
        flush(group, padded)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Encode an audio dataset to HuBERT-soft units.")
    parser.add_argument("model", choices=["soft"])
    parser.add_argument("in_dir", metavar="in-dir", type=Path)
    parser.add_argument("out_dir", metavar="out-dir", type=Path)
    parser.add_argument("--extension", default=".wav", type=str)
    parser.add_argument("--suffix_16k", action="store_true")
    parser.add_argument("--hubert", default="logs/hubert-soft.pt", type=str)
    parser.add_argument("--batch", default=16, type=int,
                        help="files per batched HuBERT forward (same-length bucket)")
    parser.add_argument("--hubert-front", default="faststats", type=str,
                        choices=["xla", "faststats", "pallas"],
                        help="extractor front mode (see convert.py); "
                             "faststats = measured-fastest serving config, "
                             "numerics identical at the compute dtype")
    args = parser.parse_args()
    encode_dataset(args)
