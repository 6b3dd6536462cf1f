"""Dataset, length-bucketing sampler, and fixed-shape collate.

Reference parity (data_utils_new_new.py) with TPU-first changes:

- ``UnitAudioSpecDataset`` loads 16 kHz wav + precomputed unit ``.npy``
  and lazily caches the linear spectrogram beside the wav
  (``.spec.npy`` instead of the reference's ``.spec.pt``,
  data_utils_new_new.py:113-118). Bucket lengths come from file size
  (filesize // (2*hop), data_utils_new_new.py:90-97).
- ``BucketSampler`` == DistributedBucketSampler semantics
  (data_utils_new_new.py:218-335): boundary buckets, drop out-of-range,
  pad each bucket to a batch multiple by repeating indices, epoch-seeded
  shuffles, rank sharding for multi-host.
- ``collate_batch``: sort by unit length desc, zero-pad, random common-crop
  per item, drop the trailing frame. TPU-first deviation: the crop length is
  the batch's bucket floor ``min(bucket_lo, max_speclen) `` (static per
  bucket) rather than the reference's per-batch ``min(shortest, 513)``
  (data_utils_new_new.py:202) — so every bucket produces ONE XLA shape.

Spectrogram cache computation is a pure-numpy replica of the on-device
``wave_to_spec`` (parity-tested), so cache and model agree while loader
threads never touch the accelerator.
"""

from __future__ import annotations

import os
import threading
from queue import Queue
from typing import Iterator, Sequence

import numpy as np

from quickvc_tpu.config import QuickVCConfig
from quickvc_tpu.data.audio_io import read_wav


def load_filepaths(list_path: str, mode: str = "train") -> list[str]:
    """Resolve the dataset spec to wav paths.

    Two modes, mirroring reference ``load_filepaths``
    (data_utils_new_new.py:20-47):
    - ``*.txt``: filelist, one (possibly |-separated) path per line;
    - a directory (the reference's speechcorpusy extension): glob
      ``**/*.wav`` with speaker = parent dir name; each speaker's LAST
      utterance goes to eval, the rest to train.
    """
    if list_path.endswith(".txt"):
        with open(list_path, encoding="utf-8") as f:
            return [line.strip().split("|")[0] for line in f if line.strip()]
    # directory corpus layout: <root>/<speaker>/<utt>.wav
    import glob as _glob

    paths = sorted(_glob.glob(os.path.join(list_path, "**", "*.wav"), recursive=True))
    paths = [p for p in paths if not p.endswith(".spec.npy")]
    by_spk: dict[str, list[str]] = {}
    for p in paths:
        by_spk.setdefault(os.path.basename(os.path.dirname(p)), []).append(p)
    out: list[str] = []
    for spk in sorted(by_spk):
        utts = by_spk[spk]
        out.extend(utts[:-1] if mode == "train" else utts[-1:])
    return out


def _compute_spec(wav: np.ndarray, cfg: QuickVCConfig) -> np.ndarray:
    """Linear spectrogram (Frame, Freq) — pure numpy, identical semantics to
    dsp.stft.wave_to_spec (reflect pad (n_fft-hop)/2, Hann, center=False,
    sqrt(power + 1e-6)). Runs on host CPU inside loader threads: using jnp
    here would dispatch per-item work to the accelerator and contend with
    the training step.
    """
    from quickvc_tpu.dsp.stft import hann_window

    n_fft, hop, win = cfg.data.filter_length, cfg.data.hop_length, cfg.data.win_length
    pad = (n_fft - hop) // 2
    y = np.pad(wav.astype(np.float32), (pad, pad), mode="reflect")
    num_frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    w = np.zeros(n_fft, np.float32)
    off = (n_fft - win) // 2
    w[off : off + win] = hann_window(win)
    z = np.fft.rfft(y[idx] * w, axis=-1)
    return np.sqrt((z.real**2 + z.imag**2 + 1e-6)).astype(np.float32)


class UnitAudioSpecDataset:
    """Per-utterance (unit, spec, wave) loader with on-disk spec cache."""

    def __init__(self, mode: str, cfg: QuickVCConfig, shuffle_seed: int = 1243,
                 cache_specs: bool = True):
        self.cfg = cfg
        list_path = cfg.data.training_files if mode == "train" else cfg.data.validation_files
        self.audiopaths = load_filepaths(list_path, mode)
        rng = np.random.default_rng(shuffle_seed)
        rng.shuffle(self.audiopaths)
        self.cache_specs = cache_specs
        self.lengths = [os.path.getsize(p) // (2 * cfg.data.hop_length)
                        for p in self.audiopaths]

    def __len__(self) -> int:
        return len(self.audiopaths)

    def __getitem__(self, index: int) -> dict[str, np.ndarray]:
        path = self.audiopaths[index]
        wav, sr = read_wav(path)
        assert sr == self.cfg.data.sampling_rate, \
            f"{sr} != configured {self.cfg.data.sampling_rate} for {path}"

        spec_path = path.replace(".wav", ".spec.npy")
        if self.cache_specs and os.path.exists(spec_path):
            spec = np.load(spec_path)
        else:
            spec = _compute_spec(wav, self.cfg)
            if self.cache_specs:
                # Unique tmp per writer: the sampler pads buckets by
                # repeating indices, so two loader threads can cache the
                # same item concurrently; a shared tmp name races on the
                # rename (both would os.replace the same source).
                tmp = f"{spec_path}.tmp.{os.getpid()}.{threading.get_ident()}.npy"
                np.save(tmp[:-4], spec)  # np.save appends .npy
                os.replace(tmp, spec_path)

        unit = np.load(path.replace(".wav", ".npy")).astype(np.float32,
                                                             copy=False)  # (Frame, 256)
        return {"unit": unit, "spec": spec, "wave": wav[:, None]}


class BucketSampler:
    """Length-bucketed batch sampler with rank sharding and epoch shuffling."""

    def __init__(self, lengths: Sequence[int], batch_size: int,
                 boundaries: Sequence[int], shuffle: bool = True,
                 num_replicas: int = 1, rank: int = 0):
        self.batch_size = batch_size
        self.boundaries = list(boundaries)
        self.shuffle = shuffle
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0

        buckets: list[list[int]] = [[] for _ in range(len(self.boundaries) - 1)]
        for i, length in enumerate(lengths):
            b = self._bisect(length)
            if b != -1:
                buckets[b].append(i)
        keep = [j for j, b in enumerate(buckets) if b]
        self.buckets = [buckets[j] for j in keep]
        # bucket_lo[k] = lower boundary of kept bucket k (items have len > lo)
        self.bucket_lo = [self.boundaries[j] for j in keep]

        total_bs = batch_size * num_replicas
        self.num_samples_per_bucket = []
        for b in self.buckets:
            rem = (total_bs - (len(b) % total_bs)) % total_bs
            self.num_samples_per_bucket.append(len(b) + rem)

    def _bisect(self, x: int) -> int:
        lo, hi = 0, len(self.boundaries) - 1
        while hi > lo:
            mid = (hi + lo) // 2
            if self.boundaries[mid] < x <= self.boundaries[mid + 1]:
                return mid
            if x <= self.boundaries[mid]:
                hi = mid
            else:
                lo = mid + 1
        return -1

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[tuple[int, list[int]]]:
        """Yields (bucket_index, item_indices) so collate knows the bucket floor."""
        g = np.random.default_rng(self.epoch)
        batches: list[tuple[int, list[int]]] = []
        total_bs = self.batch_size * self.num_replicas
        for k, bucket in enumerate(self.buckets):
            ids = list(g.permutation(len(bucket))) if self.shuffle else list(range(len(bucket)))
            rem = self.num_samples_per_bucket[k] - len(bucket)
            ids = ids + ids * (rem // len(bucket)) + ids[: rem % len(bucket)]
            for j in range(len(ids) // total_bs):
                chunk = ids[j * total_bs : (j + 1) * total_bs]
                # rank sharding: strided split of the global batch
                mine = chunk[self.rank :: self.num_replicas][: self.batch_size]
                batches.append((k, [bucket[i] for i in mine]))
        if self.shuffle:
            order = g.permutation(len(batches))
            batches = [batches[i] for i in order]
        return iter(batches)

    def __len__(self) -> int:
        return sum(n // (self.batch_size * self.num_replicas)
                   for n in self.num_samples_per_bucket)


def collate_batch(items: list[dict[str, np.ndarray]], bucket_lo: int,
                  cfg: QuickVCConfig, rng: np.random.Generator) -> dict[str, np.ndarray]:
    """Pad + random common-length crop to the bucket's static shape.

    Returns unit (B, L, 256), spec (B, L, Freq), wave (B, L*hop, 1) with
    L = min(bucket_lo, max_speclen) fixed per bucket.
    """
    hop = cfg.data.hop_length
    order = np.argsort([-it["unit"].shape[0] for it in items])
    items = [items[i] for i in order]

    seg = min(bucket_lo + 1, cfg.train.max_speclen + 1)
    b = len(items)
    unit_dim = items[0]["unit"].shape[1]
    freq = items[0]["spec"].shape[1]
    # empty + explicit pad-tail zeroing: most rows are fully overwritten
    # (bucketed lengths >= the crop), so np.zeros would double the memory
    # traffic of the assembly (~128 MB/batch at batch 64)
    out_unit = np.empty((b, seg, unit_dim), np.float32)
    out_spec = np.empty((b, seg, freq), np.float32)
    out_wave = np.empty((b, seg * hop, 1), np.float32)

    for i, it in enumerate(items):
        n_frames = min(it["unit"].shape[0], it["spec"].shape[0],
                       it["wave"].shape[0] // hop)
        max_start = max(n_frames - seg, 0)
        start = int(rng.integers(0, max_start + 1))
        take = min(seg, n_frames)
        out_unit[i, :take] = it["unit"][start : start + take]
        out_spec[i, :take] = it["spec"][start : start + take]
        out_wave[i, : take * hop] = it["wave"][start * hop : (start + take) * hop]
        if take < seg:
            out_unit[i, take:] = 0.0
            out_spec[i, take:] = 0.0
            out_wave[i, take * hop:] = 0.0

    # Drop the trailing frame (reference data_utils_new_new.py:210-213).
    return {
        "unit": out_unit[:, :-1],
        "spec": out_spec[:, :-1],
        "wave": out_wave[:, :-hop],
    }


class DataLoader:
    """Prefetching loader: whole batches assemble in parallel worker threads.

    Each batch (item loads — wav decode + spec cache + unit npy — plus the
    collate crop/pad copies) is ONE task on a thread pool; ``num_workers``
    batches assemble concurrently and up to ``num_workers + prefetch`` are
    in flight, yielded in sampler order. Batch-level granularity is what
    scales: with per-item fan-out the collate memcpys serialize behind the
    pool and cap throughput below the TPU step rate (measured: 6 -> 50+
    batches/s at batch 64, scripts/data_bench.py). numpy I/O and memcpys
    release the GIL. The reference leans on torch DataLoader subprocesses
    for the same reason (train.py:52).

    Crops are deterministic given (seed, epoch, batch index) — independent
    of thread timing.
    """

    def __init__(self, dataset: UnitAudioSpecDataset, sampler: BucketSampler,
                 cfg: QuickVCConfig, num_workers: int = 8, seed: int = 1234,
                 prefetch: int = 2):
        self.dataset = dataset
        self.sampler = sampler
        self.cfg = cfg
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch

    def __len__(self) -> int:
        return len(self.sampler)

    def _assemble(self, batch_index: int, bucket: int,
                  idxs: list[int]) -> dict[str, np.ndarray]:
        rng = np.random.default_rng(
            (self.seed, self.sampler.epoch, batch_index))
        items = [self.dataset[i] for i in idxs]
        return collate_batch(items, self.sampler.bucket_lo[bucket],
                             self.cfg, rng)

    def __iter__(self):
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        batches = list(self.sampler)
        in_flight = self.num_workers + self.prefetch
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending: deque = deque()
            nxt = 0
            while nxt < len(batches) or pending:
                while nxt < len(batches) and len(pending) < in_flight:
                    k, idxs = batches[nxt]
                    pending.append(pool.submit(self._assemble, nxt, k, idxs))
                    nxt += 1
                yield pending.popleft().result()
