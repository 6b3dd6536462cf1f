"""Forward STFT featurization (JAX, jittable, TPU-first).

Reference parity targets:

- ``wave_to_spec`` matches reference ``mel_processing.py:15-56``: reflect-pad
  ``(n_fft - hop)/2`` both sides, Hann(periodic) window, ``center=False``,
  magnitude ``sqrt(re^2 + im^2 + 1e-6)``.
- ``spec_to_mel`` matches ``mel_processing.py:59-76``: Slaney mel matmul then
  ``log(clamp(x, 1e-5))``.
- ``magnitude_stft`` matches ``torchaudio.transforms.Spectrogram(power=1)``
  as used by the multi-resolution STFT loss (reference ``losses.py:98``):
  ``center=True`` reflect padding, plain ``abs`` magnitude.

Layout: waveforms are ``(..., T)``; spectrograms are time-major
``(..., Frame, Freq)`` — channels-last so the mel projection is a clean
last-dim contraction on the MXU. (The reference uses ``(B, Freq, Frame)``.)

Framing is a static-shape gather built at trace time; FFT uses XLA's rfft.
An MXU matmul-DFT path is provided as well (``method='matmul'``) — for short
segments the tiny DFT matrices live in VMEM and the MXU beats the FFT unit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Audio featurization wants full f32 accuracy: on TPU the default matmul
# precision is bf16 on the MXU, which is far too coarse for spectrogram
# parity (and for the mel losses). All DSP matmuls request HIGHEST.
_HI = jax.lax.Precision.HIGHEST


def hann_window(n: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window, identical to ``torch.hann_window(n)``."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(dtype)


@functools.lru_cache(maxsize=None)
def _frame_indices(num_frames: int, n_fft: int, hop: int) -> np.ndarray:
    return (np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _dft_matrices(n_fft: int, win_length: int):
    """Windowed real-DFT matrices: (n_fft, n_freq) each for cos and -sin."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    w = np.zeros(n_fft)
    off = (n_fft - win_length) // 2
    w[off : off + win_length] = hann_window(win_length, np.float64)
    cos_m = (np.cos(ang) * w[:, None]).astype(np.float32)
    sin_m = (-np.sin(ang) * w[:, None]).astype(np.float32)
    return cos_m, sin_m


def _frame(y: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """(..., T) -> (..., Frame, n_fft) framing; shapes static under jit."""
    t = y.shape[-1]
    num_frames = 1 + (t - n_fft) // hop
    idx = _frame_indices(num_frames, n_fft, hop)
    return y[..., idx]


def _stft_mag(y: jax.Array, n_fft: int, hop: int, win_length: int, *, method: str) -> jax.Array:
    """Magnitude STFT of pre-padded signal: (..., T) -> (..., Frame, Freq)."""
    frames = _frame(y, n_fft, hop)
    if method == "fft":
        w = np.zeros(n_fft, np.float32)
        off = (n_fft - win_length) // 2
        w[off : off + win_length] = hann_window(win_length)
        z = jnp.fft.rfft(frames * jnp.asarray(w), axis=-1)
        return jnp.abs(z)
    elif method == "matmul":
        cos_m, sin_m = _dft_matrices(n_fft, win_length)
        re = jnp.matmul(frames, jnp.asarray(cos_m), precision=_HI)
        im = jnp.matmul(frames, jnp.asarray(sin_m), precision=_HI)
        return jnp.sqrt(re * re + im * im)
    raise ValueError(f"unknown stft method: {method}")


def wave_to_spec(
    y: jax.Array,
    n_fft: int,
    hop_size: int,
    win_size: int,
    *,
    method: str = "fft",
) -> jax.Array:
    """Linear spectrogram: (..., T) -> (..., Frame, Freq) with Frame = T//hop.

    Matches reference ``mel_processing.wave_to_spec`` (center=False with
    explicit reflect pad of (n_fft-hop)/2; magnitude ``sqrt(|z|^2 + 1e-6)``).
    """
    pad = (n_fft - hop_size) // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = _frame(y, n_fft, hop_size)
    cos_m, sin_m = _dft_matrices(n_fft, win_size)
    if method == "fft":
        w = np.zeros(n_fft, np.float32)
        off = (n_fft - win_size) // 2
        w[off : off + win_size] = hann_window(win_size)
        z = jnp.fft.rfft(frames * jnp.asarray(w), axis=-1)
        power = jnp.real(z) ** 2 + jnp.imag(z) ** 2
    else:
        re = jnp.matmul(frames, jnp.asarray(cos_m), precision=_HI)
        im = jnp.matmul(frames, jnp.asarray(sin_m), precision=_HI)
        power = re * re + im * im
    return jnp.sqrt(power + 1e-6)


def wave_to_spec_halo(
    y: jax.Array,
    n_fft: int,
    hop_size: int,
    win_size: int,
    *,
    method: str = "matmul",
) -> jax.Array:
    """:func:`wave_to_spec` for a signal that ALREADY carries the
    ``(n_fft-hop)/2`` halo on both ends: (..., T + 2*pad) -> (..., T//hop, Freq).

    Compact transfer mode (``train.transfer='compact'``) ships the raw s16
    waveform crop with this halo instead of the precomputed spectrogram —
    the spec is 53% of the training batch's bytes and is derived data; the
    halo makes the on-device framing see exactly the samples the host
    reference path (data/dataset.py:_compute_spec over the full utterance,
    then frame-crop) would have used, so interior crops match to f32
    rounding.
    """
    frames = _frame(y, n_fft, hop_size)
    cos_m, sin_m = _dft_matrices(n_fft, win_size)
    if method == "fft":
        w = np.zeros(n_fft, np.float32)
        off = (n_fft - win_size) // 2
        w[off : off + win_size] = hann_window(win_size)
        z = jnp.fft.rfft(frames * jnp.asarray(w), axis=-1)
        power = jnp.real(z) ** 2 + jnp.imag(z) ** 2
    else:
        re = jnp.matmul(frames, jnp.asarray(cos_m), precision=_HI)
        im = jnp.matmul(frames, jnp.asarray(sin_m), precision=_HI)
        power = re * re + im * im
    return jnp.sqrt(power + 1e-6)


def spec_to_mel(
    spec: jax.Array,
    mel_basis: jax.Array,
) -> jax.Array:
    """Log-mel from linear spectrogram: (..., Frame, Freq) -> (..., Frame, Mel).

    ``mel_basis`` is ``(Mel, Freq)`` from :func:`quickvc_tpu.dsp.mel_filterbank`.
    Matches reference ``spec_to_mel`` = matmul + ``log(clamp(x, 1e-5))``.
    """
    mel = jnp.matmul(spec, mel_basis.T, precision=_HI)
    return jnp.log(jnp.clip(mel, min=1e-5))


def wave_to_mel(
    y: jax.Array,
    mel_basis: jax.Array,
    n_fft: int,
    hop_size: int,
    win_size: int,
    *,
    method: str = "fft",
) -> jax.Array:
    """(..., T) -> (..., Frame, Mel). Composition per reference ``wave_to_mel``."""
    return spec_to_mel(wave_to_spec(y, n_fft, hop_size, win_size, method=method), mel_basis)


def magnitude_stft(
    y: jax.Array,
    n_fft: int,
    hop_size: int,
    win_size: int,
    *,
    method: str = "fft",
) -> jax.Array:
    """Center=True magnitude STFT: (..., T) -> (..., Frame, Freq), Frame = 1 + T//hop.

    Matches ``torchaudio.transforms.Spectrogram(n_fft, win, hop, power=1.0)``
    (reflect pad n_fft//2 both sides), used by the sub-band STFT losses.
    """
    pad = n_fft // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    return _stft_mag(y, n_fft, hop_size, win_size, method=method)
