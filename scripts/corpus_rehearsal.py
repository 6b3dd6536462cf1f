"""Corpus-scale data-layer rehearsal (VERDICT r3 item 6).

Drives the host data layer over the full multi-bucket synthetic corpus
(scripts/make_corpus.py, ~2000 utterances spanning every bucket boundary)
and reports:

- bucket population + batches/epoch at the configured batch size,
- number of DISTINCT batch shapes (== XLA step compiles a training run
  would pay; buckets above max_speclen share one crop shape),
- cold-epoch (spec-cache build) and warm-epoch loader throughput,
- sampler epoch behavior (distinct batch order across epochs, constant
  epoch length).

Host-only:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/corpus_rehearsal.py --config /tmp/qvc_corpus/all.json \
        [--transfer compact] [--epochs 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--workers", type=int, default=2)
    parser.add_argument("--transfer", default=None,
                        choices=[None, "full", "compact"])
    parser.add_argument("--mode", default="thread",
                        choices=["thread", "process"])
    args = parser.parse_args()

    from quickvc_tpu.config import load_config
    from quickvc_tpu.data import BucketSampler, DataLoader, UnitAudioSpecDataset
    from quickvc_tpu.train.loop import BUCKET_BOUNDARIES

    cfg = load_config(args.config)
    if args.transfer:
        cfg.train.transfer = args.transfer
    ds = UnitAudioSpecDataset("train", cfg,
                              with_spec=cfg.train.transfer != "compact")
    sampler = BucketSampler(ds.lengths, cfg.train.batch_size,
                            BUCKET_BOUNDARIES, shuffle=True)
    loader = DataLoader(ds, sampler, cfg, num_workers=args.workers,
                        mode=args.mode)

    sizes = {lo: len(b) for lo, b in zip(sampler.bucket_lo, sampler.buckets)}
    print(f"corpus: {len(ds)} items, {len(sampler.buckets)} populated "
          f"buckets, {len(sampler)} batches/epoch at b{cfg.train.batch_size}")
    print("bucket_lo -> items:", sizes)

    orders = []
    for epoch in range(args.epochs):
        sampler.set_epoch(epoch)
        t0 = time.time()
        shapes = set()
        n = 0
        key = "unit"
        order_sig = []
        for batch in loader:
            shapes.add(tuple(batch[k].shape for k in sorted(batch)))
            order_sig.append(batch[key].shape[1])
            n += 1
        dt = time.time() - t0
        orders.append(order_sig)
        label = "cold" if epoch == 0 else "warm"
        print(f"epoch {epoch} ({label}): {n} batches in {dt:.1f} s = "
              f"{n / dt:.2f} batches/s; distinct shapes so far: {len(shapes)}")
    print(f"distinct batch shapes: {len(shapes)} "
          f"(= XLA train-step compiles for a full run)")
    if len(orders) > 1:
        same = all(a == b for a, b in zip(orders[0], orders[1])) and \
            len(orders[0]) == len(orders[1])
        print(f"epoch shuffling: lengths {len(orders[0])} vs {len(orders[1])}; "
              f"orders identical across epochs: {same} (want False or "
              f"coincidence on tiny corpora)")
    loader.close()


if __name__ == "__main__":
    main()
