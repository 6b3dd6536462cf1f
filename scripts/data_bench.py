"""Input-pipeline throughput: does the host loader keep the chip fed?

The full-size GAN step is 112 ms at batch 64 (BENCH.md) -> the loader must
assemble >= 571 items/s to keep one chip busy (and N chips need N x that
from each host's shard). This bench generates a synthetic on-disk dataset
(real wav files + unit .npy, reference data layout), then measures
DataLoader epochs:

- cold: first epoch computes + writes the .spec.npy cache per item
  (the reference does the same with .spec.pt, data_utils_new_new.py:113-118)
- warm: subsequent epochs read the cache

Prints items/s, batches/s, audio-seconds/s, and the headroom factor over
the TPU step rate. Host-only (run under JAX_PLATFORMS=cpu).

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/data_bench.py --n-files 512
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STEP_MS = 112.3  # measured full-size GAN step, batch 64 bf16 (BENCH.md)


def build_dataset(root: str, n_files: int, seed: int = 0) -> str:
    from quickvc_tpu.data.audio_io import write_wav_int16

    rng = np.random.default_rng(seed)
    os.makedirs(f"{root}/data", exist_ok=True)
    hop, sr = 320, 16000
    paths = []
    for i in range(n_files):
        frames = int(rng.integers(250, 600))  # 5-12 s utterances
        n = frames * hop
        t = np.arange(n) / sr
        w = (0.3 * np.sin(2 * np.pi * (100 + 30 * (i % 7)) * t)
             + 0.05 * rng.standard_normal(n)).astype(np.float32)
        p = f"{root}/data/utt{i:05d}.wav"
        write_wav_int16(p, w, sr)
        np.save(p.replace(".wav", ".npy"),
                rng.standard_normal((frames, 256)).astype(np.float32))
        paths.append(p)
    with open(f"{root}/train.txt", "w") as f:
        f.writelines(p + "\n" for p in paths)
    return f"{root}/train.txt"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-files", type=int, default=512)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--num-workers", type=int,
                        default=min(8, os.cpu_count() or 1))
    parser.add_argument("--root", default="/tmp/qvc_data_bench")
    parser.add_argument("--worker-sweep", action="store_true",
                        help="after cache warmup, measure warm epochs at "
                             "1/2/4/8 workers in BOTH modes (scaling curve)")
    parser.add_argument("--mode", default="thread",
                        choices=["thread", "process"],
                        help="worker mode for the cold/warm epochs")
    parser.add_argument("--transfer", default="full",
                        choices=["full", "compact"],
                        help="wire format to assemble ('full' matches the "
                             "recorded BENCH.md loader numbers; compact "
                             "skips host spec work and is ~2x faster)")
    args = parser.parse_args()

    from quickvc_tpu.config import QuickVCConfig
    from quickvc_tpu.data.dataset import (BucketSampler, DataLoader,
                                          UnitAudioSpecDataset)
    from quickvc_tpu.train.loop import BUCKET_BOUNDARIES

    shutil.rmtree(args.root, ignore_errors=True)
    t0 = time.perf_counter()
    listfile = build_dataset(args.root, args.n_files)
    print(f"built {args.n_files} files in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    cfg = QuickVCConfig()
    cfg.data.training_files = listfile
    cfg.data.validation_files = listfile
    cfg.train.batch_size = args.batch_size
    cfg.train.transfer = args.transfer
    ds = UnitAudioSpecDataset("train", cfg,
                              with_spec=args.transfer != "compact")
    sampler = BucketSampler(ds.lengths, args.batch_size, BUCKET_BOUNDARIES)
    loader = DataLoader(ds, sampler, cfg, num_workers=args.num_workers,
                        mode=args.mode)

    def one_epoch(name, ldr):
        sampler.set_epoch(0 if name == "cold" else 1)
        t0 = time.perf_counter()
        n_batches = n_items = 0
        audio_s = 0.0
        for batch in ldr:
            n_batches += 1
            w = batch.get("wave")
            if w is None:  # compact wire format
                w = batch["wave_s16"]
            n_items += w.shape[0]
            audio_s += w.shape[0] * w.shape[1] / 16000
        dt = time.perf_counter() - t0
        rec = {
            "epoch": name,
            "mode": ldr.mode,
            "workers": ldr.num_workers,
            "items_per_s": round(n_items / dt, 1),
            "batches_per_s": round(n_batches / dt, 2),
            "audio_seconds_per_s": round(audio_s / dt, 1),
            # headroom over ONE chip's consumption at the measured step rate
            "chip_feed_headroom": round(
                (n_batches / dt) / (1000.0 / STEP_MS), 2),
        }
        print(json.dumps(rec), flush=True)

    one_epoch("cold", loader)   # computes + writes .spec.npy caches
    one_epoch("warm", loader)
    one_epoch("warm2", loader)
    if args.worker_sweep:
        for mode in ("thread", "process"):
            for w in (1, 2, 4, 8):
                ldr = DataLoader(ds, sampler, cfg, num_workers=w, mode=mode)
                # steady-state epoch per config; first epoch warms the
                # pool (spawned processes) -> measure the second
                one_epoch(f"pool_warmup_{mode}_w{w}", ldr)
                one_epoch(f"warm_{mode}_w{w}", ldr)
                ldr.close()
    loader.close()
    shutil.rmtree(args.root, ignore_errors=True)


if __name__ == "__main__":
    main()
