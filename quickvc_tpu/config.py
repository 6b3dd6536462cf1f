"""Typed configuration system.

Reference parity: mirrors the JSON schema of ``configs/quickvc.json`` and the
typed dataclasses at ``utils.py:19-75`` in the reference. Unknown/legacy keys
(e.g. ``ssl_dim``, ``use_sr``, ``n_layers_q`` present in the pretrained run's
``logs/quickvc/config.json``) are accepted and ignored, matching the
``**kwargs`` backward-compat shim at reference ``models.py:568-575``.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any


def _filter_kwargs(cls, d: dict[str, Any]) -> dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


@dataclass
class TrainConfig:
    """Training hyperparameters (reference ``utils.py:20-38``)."""

    log_interval: int = 20
    eval_interval: int = 1000
    seed: int = 1234
    epochs: int = 20000
    learning_rate: float = 2e-4
    betas: tuple[float, float] = (0.8, 0.99)
    eps: float = 1e-9
    batch_size: int = 32
    fp16_run: bool = False          # reference AMP flag; on TPU we use bf16 (see ``precision``)
    lr_decay: float = 0.999875      # per-epoch exponential decay (reference train.py:71-72)
    segment_size: int = 10240       # decoder training segment [samples]
    c_mel: float = 45.0
    c_kl: float = 1.0
    max_speclen: int = 512          # collate crop cap [frames]
    fft_sizes: tuple[int, ...] = (384, 683, 171)
    hop_sizes: tuple[int, ...] = (30, 60, 10)
    win_lengths: tuple[int, ...] = (150, 300, 60)
    window: str = "hann_window"
    # --- TPU-native additions (no reference equivalent) ---
    precision: str = "bf16"         # "f32" | "bf16": compute dtype inside the jitted step
    num_hosts: int = 1
    data_axis: str = "data"
    disc_width: float = 1.0         # discriminator channel scale (tests use < 1)
    loader_workers: int = 8         # host DataLoader parallelism
    loader_mode: str = "thread"     # "thread" | "process" (shared-memory
                                    # workers; GIL-free feed for multi-chip
                                    # hosts — see data/dataset.py DataLoader)
    grad_reduce_dtype: str = "f32"  # "f32" (GSPMD auto-psum) | "bf16"
                                    # (explicit shard_map pmean in bf16 —
                                    # halves the per-step 348 MB DP gradient
                                    # traffic; parallel/shard_step.py)
    guard_nonfinite: bool = True    # skip an optimizer update when its grads
                                    # contain inf/nan (the reference's
                                    # GradScaler step-skip, train.py:133-137,
                                    # 155-162, generalized to bf16 — no loss
                                    # scaling, just the skip)
    guard_loss_max: float = 65504.0  # fp16-overflow-parity threshold: also
                                    # skip an update whose loss EXCEEDS this
                                    # (finite in bf16's 3.4e38 range, but the
                                    # reference's fp16 autocast would have
                                    # overflowed it to inf and GradScaler
                                    # would skip — measured: without it, a
                                    # bf16 GAN run applies 1e12..1e31-loss
                                    # poisoned updates and oscillates;
                                    # BENCH.md "real-unit run"). 0 disables.
                                    # Independent of guard_nonfinite: the
                                    # threshold alone still skips oversized-
                                    # loss updates (scalar checks only — no
                                    # per-leaf grad finiteness sums).
    split_prior: bool = False       # run enc_p in its own vjp AFTER the D
                                    # update (it feeds only the KL loss):
                                    # at n>1 its compute can hide under the
                                    # D-phase gradient all-reduce. Perf
                                    # experiment (BENCH.md); rng stream
                                    # differs from the monolithic layout,
                                    # so trajectories are equal in
                                    # distribution, not bitwise
    prefetch_batches: int = 2       # device batches kept in flight ahead
                                    # of the running step (train/loop.py
                                    # device_batches); 1 = classic double
                                    # buffering, more smooths jittery
                                    # loaders/links at one resident batch
                                    # of HBM each
    transfer: str = "compact"       # host->device batch format (the step
                                    # auto-detects from the batch keys, so
                                    # this drives the training LOADER):
                                    # "full"    = f32 unit + precomputed f32
                                    #             spec + f32 wave (reference-
                                    #             parity data flow, ~160 MB
                                    #             per b64 x 512f batch)
                                    # "compact" = s16 wave crop with STFT
                                    #             halo + unit in the step's
                                    #             compute dtype; the linear
                                    #             spec is recomputed on-device
                                    #             (it is DERIVED data and 53%
                                    #             of the batch bytes; fused
                                    #             Pallas kernel, +0.8 ms/step
                                    #             device cost) — ~38 MB per
                                    #             b64 batch at bf16, 4.2x
                                    #             less H2D + no host spec
                                    #             cache, numerics equal to
                                    #             "full" at f32 rounding
                                    #             (tests/test_train_step.py::
                                    #             TestCompactTransfer).
                                    # Default "compact": the TPU-first wire
                                    # format, proven at production shape
                                    # (BENCH.md flagship 520-step run); set
                                    # "full" for bit-level reference-parity
                                    # data-flow debugging.
    zero_opt_state: bool = False    # ZeRO-1: shard AdamW moments over the
                                    # data axis (parallel/mesh.py:
                                    # zero1_state_sharding) — n× less
                                    # optimizer state per chip, GSPMD
                                    # partitions the update; params stay
                                    # replicated. GSPMD path only.
    ckpt_max_to_keep: int = 5       # orbax retention; the reference keeps
                                    # every G_*/D_*.pth it ever writes
                                    # (utils.py:181-193), which at 1000-step
                                    # cadence over 1.2M steps is a policy
                                    # choice — make it configurable
    max_host_rss_gb: float = 0.0    # if >0, the loop checkpoints and exits
                                    # with RESTART_EXIT_CODE (75) when this
                                    # process's RSS crosses the limit —
                                    # loss-free restart point for host-side
                                    # leaks (the axon tunnel client stages
                                    # ~90 MB/step; resume is bit-exact).
                                    # scripts/supervise_train.py relaunches
                                    # automatically. Checked at log_interval
                                    # cadence; single-process runs only
                                    # (multi-process restarts belong to the
                                    # external launcher)
    export_torch_every: int = 0     # if >0, also write reference-layout
                                    # G_<step>.pth/D_<step>.pth every N steps
                                    # (reference train.py:181-186 behavior)
                                    # via utils/torch_export.py

    def __post_init__(self):
        allowed = ("f32", "bf16")
        if self.grad_reduce_dtype not in allowed:
            # f16 would overflow at 65504 during the all-reduce, turning
            # grads inf so the non-finite guard silently skips every update.
            raise ValueError(
                f"grad_reduce_dtype={self.grad_reduce_dtype!r}: must be one "
                f"of {allowed}")
        if self.precision not in ("f32", "bf16"):
            raise ValueError(
                f"precision={self.precision!r}: must be 'f32' or 'bf16'")
        if self.transfer not in ("full", "compact"):
            raise ValueError(
                f"transfer={self.transfer!r}: must be 'full' or 'compact'")
        if self.loader_mode not in ("thread", "process"):
            raise ValueError(
                f"loader_mode={self.loader_mode!r}: must be 'thread' or "
                f"'process'")
        if self.zero_opt_state and self.grad_reduce_dtype != "f32":
            raise ValueError(
                "zero_opt_state requires the GSPMD path "
                "(grad_reduce_dtype='f32'); the explicit shard_map step "
                "carries fully-replicated state")


@dataclass
class DataConfig:
    """Data/featurization hyperparameters (reference ``utils.py:41-51``)."""

    training_files: str = "./dataset/train.txt"
    validation_files: str = "./dataset/test.txt"
    adress_data_root: str = ""
    sampling_rate: int = 16000
    filter_length: int = 1280       # STFT n_fft
    hop_length: int = 320
    win_length: int = 1280
    n_mel_channels: int = 80
    mel_fmin: float = 0.0
    mel_fmax: float | None = None


@dataclass
class ModelConfig:
    """Model hyperparameters (reference ``utils.py:54-68``)."""

    ms_istft_vits: bool = True
    mb_istft_vits: bool = False
    istft_vits: bool = False
    subbands: int = 4
    gen_istft_n_fft: int = 16
    gen_istft_hop_size: int = 4
    inter_channels: int = 192
    hidden_channels: int = 192
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: tuple[int, ...] = (5, 4)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: tuple[int, ...] = (16, 16)
    gin_channels: int = 256
    unit_channels: int = 256        # HuBERT-soft unit dim (hardcoded at reference models.py:579)
    # Encoder/flow depths (reference hardcodes 16/4/4 at models.py:582-584).
    enc_wn_layers: int = 16
    flow_wn_layers: int = 4
    n_flows: int = 4
    # TPU-native: use the Pallas fused iSTFT head (ops/fused_istft.py).
    use_pallas_istft: bool = False

    @property
    def decoder_kind(self) -> str:
        if self.mb_istft_vits:
            return "mb_istft"
        if self.ms_istft_vits:
            return "ms_istft"
        if self.istft_vits:
            return "istft"
        raise ValueError("No decoder flag set (reference models.py:588-589)")


@dataclass
class QuickVCConfig:
    """Root config (reference ``utils.py:71-75``)."""

    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    model_dir: str = "./logs/quickvc"

    # Derived quantities used model-wide.
    @property
    def spec_channels(self) -> int:
        return self.data.filter_length // 2 + 1

    @property
    def segment_frames(self) -> int:
        return self.train.segment_size // self.data.hop_length

    def to_dict(self) -> dict[str, Any]:
        def conv(x):
            if dataclasses.is_dataclass(x):
                return {f.name: conv(getattr(x, f.name)) for f in dataclasses.fields(x)}
            if isinstance(x, (list, tuple)):
                return [conv(v) for v in x]
            return x
        return conv(self)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)


def _tupleize(x):
    if isinstance(x, list):
        return tuple(_tupleize(v) for v in x)
    return x


def config_from_dict(d: dict[str, Any]) -> QuickVCConfig:
    train = TrainConfig(**{k: _tupleize(v) for k, v in _filter_kwargs(TrainConfig, d.get("train", {})).items()})
    data = DataConfig(**_filter_kwargs(DataConfig, d.get("data", {})))
    model = ModelConfig(**{k: _tupleize(v) for k, v in _filter_kwargs(ModelConfig, d.get("model", {})).items()})
    return QuickVCConfig(train=train, data=data, model=model, model_dir=d.get("model_dir", "./logs/quickvc"))


def load_config(path: str) -> QuickVCConfig:
    """Load a QuickVC JSON config (accepts both new and reference schemas)."""
    with open(path) as f:
        return config_from_dict(json.load(f))


def get_config(config_path: str, model_name: str = "quickvc", model_root: str = "./logs") -> QuickVCConfig:
    """CLI-style config resolution: load JSON, set model_dir, archive a copy.

    Mirrors reference ``utils.get_hparams`` (utils.py:78-102): the resolved
    config is self-archived into ``model_dir/config.json``.
    """
    cfg = load_config(config_path)
    cfg.model_dir = os.path.join(model_root, model_name)
    os.makedirs(cfg.model_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.model_dir, "config.json"))
    return cfg
