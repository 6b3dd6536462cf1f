"""Offline preprocessing: trim + peak-normalize + resample to 16 kHz s16 wav.

Reference parity: downsample.py / downsample_general.py (trim 20 dB,
peak-scale 0.95, resample to 16 kHz, write 16-bit PCM). Handles WAV and
FLAC trees (VCTK mic2 flac decodes via the native C++ decoder —
``make -C native`` once).

    python downsample.py --in-dir <tree> [--out-dir <tree>] [--extension .flac]
"""

from __future__ import annotations

import argparse
import os
from multiprocessing import Pool, cpu_count
from pathlib import Path

from quickvc_tpu.data.audio_io import (
    peak_normalize,
    read_audio,
    resample,
    trim_silence,
    write_wav_int16,
)

TARGET_SR = 16000


def process_one(job: tuple[str, str]) -> str | None:
    in_path, out_path = job
    try:
        wav, sr = read_audio(in_path)
    except Exception as e:
        return f"skip {in_path}: {e}"
    wav, _ = trim_silence(wav, top_db=20)
    wav = peak_normalize(wav, 0.95)
    wav = resample(wav, sr, TARGET_SR)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    write_wav_int16(out_path, wav, TARGET_SR)
    return None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--in-dir", required=True, type=str)
    parser.add_argument("--out-dir", default=None, type=str,
                        help="default: write .16k.wav beside inputs")
    parser.add_argument("--extension", default=".wav", type=str)
    parser.add_argument("--num-workers", default=max(1, cpu_count() - 2), type=int)
    args = parser.parse_args()

    paths = sorted(Path(args.in_dir).rglob(f"*{args.extension}"))
    jobs = []
    for p in paths:
        if args.out_dir:
            out = Path(args.out_dir) / p.relative_to(args.in_dir).with_suffix(".wav")
        else:
            out = p.with_suffix(".16k.wav")
        jobs.append((str(p), str(out)))

    with Pool(args.num_workers) as pool:
        for msg in pool.imap_unordered(process_one, jobs):
            if msg:
                print(msg)
    print(f"done: {len(jobs)} files")


if __name__ == "__main__":
    main()
