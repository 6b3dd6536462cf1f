"""Host-side data layer: audio I/O, dataset, bucketing sampler, collate.

All host CPU work (numpy/scipy); the device only ever sees fixed-shape
batches. TPU-first deviation from the reference: batch crop lengths are
quantized to the bucket's lower boundary so every bucket yields ONE static
shape (bounded XLA compile count) instead of the reference's per-batch
dynamic ``min(shortest, 513)`` (data_utils_new_new.py:202).
"""

from quickvc_tpu.data.audio_io import read_wav, write_wav, resample, trim_silence  # noqa: F401
from quickvc_tpu.data.dataset import (  # noqa: F401
    BucketSampler,
    DataLoader,
    UnitAudioSpecDataset,
    collate_batch,
    load_filepaths,
)
