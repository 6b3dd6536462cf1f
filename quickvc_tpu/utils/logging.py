"""Logging & observability: file logger, TensorBoard scalars/images/audio.

Reference equivalent: utils.get_logger/summarize/plot_spectrogram_to_numpy
(utils.py:206-257). Uses tensorboardX (torch-free) and matplotlib Agg.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Mapping

import numpy as np


def get_logger(model_dir: str, filename: str = "train.log") -> logging.Logger:
    # Keyed by the FULL log path: two model dirs sharing a basename (or one
    # process training in several dirs in sequence) must not inherit each
    # other's cached file handler.
    target = os.path.abspath(os.path.join(model_dir, filename))
    logger = logging.getLogger(f"quickvc[{target}]")
    logger.setLevel(logging.DEBUG)
    logger.propagate = False  # avoid duplicate lines via the root handler
    if not any(isinstance(h, logging.FileHandler) and h.baseFilename == target
               for h in logger.handlers):
        for h in list(logger.handlers):
            logger.removeHandler(h)
            h.close()
        os.makedirs(model_dir, exist_ok=True)
        fh = logging.FileHandler(target)
        fh.setFormatter(logging.Formatter("%(asctime)s\t%(name)s\t%(levelname)s\t%(message)s"))
        logger.addHandler(fh)
        sh = logging.StreamHandler(sys.stdout)
        sh.setLevel(logging.INFO)
        logger.addHandler(sh)
    return logger


def plot_spectrogram(spectrogram: np.ndarray) -> np.ndarray:
    """Render a (Freq, Frame) spectrogram to an HWC uint8 image."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 2))
    im = ax.imshow(spectrogram, aspect="auto", origin="lower", interpolation="none")
    plt.colorbar(im, ax=ax)
    plt.xlabel("Frames")
    plt.ylabel("Channels")
    plt.tight_layout()
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return data


class Summarizer:
    """TensorBoard writer wrapper (scalars / images / audio)."""

    def __init__(self, log_dir: str):
        from tensorboardX import SummaryWriter
        self.writer = SummaryWriter(log_dir=log_dir)

    def scalars(self, step: int, values: Mapping[str, float]) -> None:
        for k, v in values.items():
            arr = np.asarray(v)
            if arr.ndim == 0:
                self.writer.add_scalar(k, float(arr), step)
            else:  # per-discriminator vectors etc.
                for i, x in enumerate(arr.ravel()):
                    self.writer.add_scalar(f"{k}/{i}", float(x), step)

    def histograms(self, step: int, values: Mapping[str, np.ndarray]) -> None:
        for k, v in values.items():
            self.writer.add_histogram(k, np.asarray(v), step)

    def images(self, step: int, values: Mapping[str, np.ndarray]) -> None:
        for k, v in values.items():
            self.writer.add_image(k, v, step, dataformats="HWC")

    def audios(self, step: int, values: Mapping[str, np.ndarray], sr: int) -> None:
        for k, v in values.items():
            try:
                self.writer.add_audio(k, v.reshape(-1, 1), step, sample_rate=sr)
            except (ImportError, ModuleNotFoundError):
                # tensorboardX's audio encoder needs soundfile; degrade to
                # plain wav files next to the event logs.
                from quickvc_tpu.data.audio_io import write_wav

                out_dir = os.path.join(self.writer.logdir, "audio")
                os.makedirs(out_dir, exist_ok=True)
                name = k.replace("/", "_")
                write_wav(os.path.join(out_dir, f"{name}_{step}.wav"),
                          np.asarray(v, dtype=np.float32), sr)

    def flush(self) -> None:
        self.writer.flush()
