"""Inverse STFT for the decoder synthesis head (JAX, TPU-first).

Reference parity: ``torchaudio.transforms.InverseSpectrogram(n_fft, n_fft,
hop)`` as used by all three decoder variants (reference ``models.py:143,241,
350``), i.e. ``torch.istft`` with ``center=True``, Hann(periodic) window,
``onesided=True``: per-frame irFFT, window, overlap-add, divide by the
overlap-added squared window, trim ``n_fft//2`` from both ends.

TPU-first design: the decoder's n_fft is tiny (16), so the irFFT is two
small matmuls against precomputed windowed inverse-DFT matrices (MXU work,
batched over B*Band*Frame rows), and the overlap-add is ``R = n_fft/hop``
shifted adds of hop-sized chunks — fully dense, no scatter, XLA-fusable.
This whole head (exp/sin polar decode + irDFT + OLA) is the Pallas fusion
target; the XLA version here is the reference implementation and the
numerical oracle for the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from quickvc_tpu.dsp.stft import hann_window


@functools.lru_cache(maxsize=None)
def _inverse_dft_matrices(n_fft: int):
    """Windowed inverse real-DFT matrices (freq, n_fft) for re and im parts.

    frame[n] = (1/N) * sum_k c_k * (re_k cos(2 pi k n / N) - im_k sin(...)),
    with c_k = 1 for k in {0, N/2} and 2 otherwise (onesided symmetry),
    then multiplied by the synthesis window.
    """
    n_freq = n_fft // 2 + 1
    k = np.arange(n_freq)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    c = np.full((n_freq, 1), 2.0)
    c[0, 0] = 1.0
    if n_fft % 2 == 0:
        c[-1, 0] = 1.0
    w = hann_window(n_fft, np.float64)[None, :]
    basis_re = (c * np.cos(ang) / n_fft) * w
    basis_im = (-c * np.sin(ang) / n_fft) * w
    return basis_re.astype(np.float32), basis_im.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _ola_envelope(num_frames: int, n_fft: int, hop: int) -> np.ndarray:
    """Overlap-added squared-window normalization envelope (length hop*(F-1)+n_fft)."""
    w2 = hann_window(n_fft, np.float64) ** 2
    env = np.zeros(hop * (num_frames - 1) + n_fft)
    for f in range(num_frames):
        env[f * hop : f * hop + n_fft] += w2
    # torch.istft checks nonzero-ness only on the center-trimmed region; the
    # trimmed edges (hann[0] == 0) may be zero — guard them for the division.
    half = n_fft // 2
    assert env[half:-half].min() > 1e-11, "OLA envelope has near-zeros in output region"
    env = np.where(env < 1e-11, 1.0, env)
    return (1.0 / env).astype(np.float32)


def _overlap_add(frames: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """(..., Frame, n_fft) -> (..., hop*(Frame-1) + n_fft) via R shifted adds."""
    assert n_fft % hop == 0, "OLA fast path requires hop | n_fft"
    r = n_fft // hop
    num_frames = frames.shape[-2]
    chunks = frames.reshape(frames.shape[:-1] + (r, hop))  # (..., F, R, hop)
    total_p = num_frames + r - 1
    out = None
    for j in range(r):
        cj = chunks[..., j, :]  # (..., F, hop)
        pad = [(0, 0)] * (cj.ndim - 2) + [(j, total_p - num_frames - j), (0, 0)]
        cj = jnp.pad(cj, pad)
        out = cj if out is None else out + cj
    return out.reshape(out.shape[:-2] + (total_p * hop,))


def inverse_stft(re: jax.Array, im: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Complex spectrum (..., Frame, Freq) x2 -> waveform (..., hop*(Frame-1)).

    Matches ``torch.istft(z, n_fft, hop, n_fft, hann, center=True)``.
    Runs in f32 regardless of input dtype — waveform samples need far more
    than bf16 mantissa (the audio noise floor), and these matmuls are tiny.
    """
    hi = jax.lax.Precision.HIGHEST
    re = re.astype(jnp.float32)
    im = im.astype(jnp.float32)
    basis_re, basis_im = _inverse_dft_matrices(n_fft)
    frames = (jnp.matmul(re, jnp.asarray(basis_re), precision=hi)
              + jnp.matmul(im, jnp.asarray(basis_im), precision=hi))  # (..., F, n_fft)
    y = _overlap_add(frames, n_fft, hop)
    env = jnp.asarray(_ola_envelope(frames.shape[-2], n_fft, hop))
    y = y * env
    half = n_fft // 2
    return y[..., half:-half]


def polar_inverse_stft(log_mag: jax.Array, phase_raw: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Decoder-head decode: z = exp(log_mag) * exp(i * pi * sin(phase_raw)).

    Fuses the polar decode used by all decoder variants (reference
    ``models.py:179-181,285-287,399-401``) with the inverse STFT.
    Inputs are time-major (..., Frame, Freq).
    """
    log_mag = log_mag.astype(jnp.float32)
    phase_raw = phase_raw.astype(jnp.float32)
    mag = jnp.exp(log_mag)
    phase = jnp.pi * jnp.sin(phase_raw)
    return inverse_stft(mag * jnp.cos(phase), mag * jnp.sin(phase), n_fft, hop)
