"""Pallas TPU kernel: fused wave -> log-mel featurization.

The reference featurizes via torch.stft + mel matmul + log-clamp
(mel_processing.py); BASELINE.json's north star asks for the STFT as an
on-device Pallas kernel. This kernel fuses the whole chain —
hop-chunk framing, Hann windowing, real DFT, magnitude, mel projection,
log-clamp — so the (Frame, 641) spectrogram never exists in HBM and all
heavy math is MXU matmuls.

Restructuring (same trick as ops/fused_istft.py, forward direction):
frame p = concat of hop-chunks p..p+R-1 (R = n_fft/hop = 4), so with the
wave viewed as (hops, hop) rows,

    spec[p] = |sum_j chunks[p + j] @ Wdft[j*hop : (j+1)*hop]|

i.e. R accumulated (TILE, hop_pad) x (hop_pad, 2*freq_pad) matmuls per
frame tile — no gather, no overlapping reads (per-shift row slices), and
the window folds into Wdft.

TPU layout rules baked in:
- hop chunks are padded 320 -> 384 lanes (3x128); Wdft has matching zero
  rows, so padding contributes exactly 0;
- re/im output blocks are 768 lanes each (641 used) so the re/im split is
  a 128-aligned lane slice; junk magnitude columns beyond 641 are killed
  by zero rows in the padded mel basis;
- mel output is 128 lanes (80 used), sliced on the host.

Parity: matches dsp.stft.wave_to_mel (itself golden-tested vs torch.stft)
— see tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quickvc_tpu.dsp.stft import hann_window

TILE_F = 256          # frames per program
LANE = 128


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def _fused_basis(n_fft: int, hop: int, win: int):
    """Per-shift DFT chunks with folded window, lane-padded.

    Returns wdft: (R, hop_pad, 2*freq_pad) — columns [0:freq_pad) real,
    [freq_pad:) imag; rows >= hop are zero.
    """
    r = n_fft // hop
    n_freq = n_fft // 2 + 1
    hop_pad = _pad_to(hop, LANE)
    freq_pad = _pad_to(n_freq, LANE)
    w = np.zeros(n_fft)
    off = (n_fft - win) // 2
    w[off : off + win] = hann_window(win, np.float64)
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    cos_m = np.cos(ang) * w[:, None]   # (n_fft, n_freq)
    sin_m = -np.sin(ang) * w[:, None]
    out = np.zeros((r, hop_pad, 2 * freq_pad), np.float32)
    for j in range(r):
        rows = slice(j * hop, (j + 1) * hop)
        out[j, :hop, :n_freq] = cos_m[rows]
        out[j, :hop, freq_pad : freq_pad + n_freq] = sin_m[rows]
    return out


@functools.lru_cache(maxsize=None)
def _padded_mel_basis(sr: int, n_fft: int, n_mels: int, fmin: float,
                      fmax: float | None):
    """(freq_pad, mel_pad) mel basis, zero rows beyond n_freq."""
    from quickvc_tpu.dsp.mel import mel_filterbank

    n_freq = n_fft // 2 + 1
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)  # (n_mels, n_freq)
    out = np.zeros((_pad_to(n_freq, LANE), _pad_to(n_mels, LANE)), np.float32)
    out[:n_freq, :n_mels] = fb.T
    return out


HALO_ROWS = 8  # r-1 rounded up to the sublane tile (Mosaic slice lengths must be 8-aligned)


def _kernel(chunks_hbm, wdft_ref, mel_ref, out_ref, scratch, sem, *, r, freq_pad):
    # Grid (batch, frame tiles). Overlapping frame windows can't be
    # expressed as BlockSpec tiles (block index maps are block-granular),
    # so each program DMAs its haloed (TILE_F + 8)-row window from HBM.
    i = pl.program_id(0)
    s = pl.program_id(1)
    cp = pltpu.make_async_copy(
        chunks_hbm.at[i, pl.ds(s * TILE_F, TILE_F + HALO_ROWS)], scratch, sem)
    cp.start()
    cp.wait()

    rows = scratch[:]                                   # (TILE_F + 8, hop_pad)
    zi = None
    for j in range(r):
        cj = rows[j : j + TILE_F]                       # (TILE_F, hop_pad)
        # precision=HIGHEST: Mosaic's default f32 matmul rounds the
        # multiplicands to bf16 on the MXU — ~1% spectrogram error, found
        # by the round-5 on-TPU parity gate (interpret mode is exact f32
        # and hid it). Same rationale as dsp/stft.py's _HI matmuls; the
        # multi-pass cost is a fraction of the kernel's DMA-bound budget.
        acc = jnp.dot(cj, wdft_ref[j], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        zi = acc if zi is None else zi + acc            # (TILE_F, 2*freq_pad)
    re = zi[:, :freq_pad]
    im = zi[:, freq_pad:]
    spec = jnp.sqrt(re * re + im * im + 1e-6)
    mel = jnp.dot(spec, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = jnp.log(jnp.clip(mel, min=1e-5))


def _spec_kernel(chunks_hbm, wdft_ref, out_ref, scratch, sem, *, r, freq_pad):
    """Same framing/DFT pipeline as _kernel, emitting the LINEAR spec."""
    i = pl.program_id(0)
    s = pl.program_id(1)
    cp = pltpu.make_async_copy(
        chunks_hbm.at[i, pl.ds(s * TILE_F, TILE_F + HALO_ROWS)], scratch, sem)
    cp.start()
    cp.wait()
    rows = scratch[:]
    zi = None
    for j in range(r):
        cj = rows[j : j + TILE_F]
        # precision=HIGHEST — this kernel computes the TRAINING spec in
        # compact mode; see the matching note in _kernel above
        acc = jnp.dot(cj, wdft_ref[j], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        zi = acc if zi is None else zi + acc
    re = zi[:, :freq_pad]
    im = zi[:, freq_pad:]
    out_ref[0] = jnp.sqrt(re * re + im * im + 1e-6)


def wave_to_spec_halo_pallas(y_halo: jax.Array, n_fft: int, hop: int,
                             win: int) -> jax.Array:
    """(B, T + 2*pad) halo'd wave -> (B, T//hop, n_freq) linear spec.

    Fused framing+DFT+magnitude for the compact-transfer training step
    (train/step.py): the input already carries the (n_fft-hop)/2 halo, so
    no pad here; matches dsp.stft.wave_to_spec_halo (XLA) to f32 rounding.
    Non-differentiable — fine: the spec is batch-derived, and the step
    differentiates only w.r.t. params. Measured: replaces ~6 ms of
    f32-HIGHEST XLA DFT matmuls per b64 x 512f step (BENCH.md).
    """
    assert n_fft % hop == 0
    r = n_fft // hop
    pad = (n_fft - hop) // 2
    b, tp = y_halo.shape
    t = tp - 2 * pad
    f = t // hop
    n_freq = n_fft // 2 + 1
    hop_pad = _pad_to(hop, LANE)
    freq_pad = _pad_to(n_freq, LANE)
    assert (2 * pad) % hop == 0

    n_hops = tp // hop                      # = f + r - 1
    n_tiles = -(-f // TILE_F)
    rows_pad = n_tiles * TILE_F + HALO_ROWS
    chunks = y_halo.astype(jnp.float32)[:, : n_hops * hop].reshape(b, n_hops, hop)
    chunks = jnp.pad(chunks, [(0, 0), (0, rows_pad - n_hops), (0, hop_pad - hop)])

    wdft = jnp.asarray(_fused_basis(n_fft, hop, win))
    out = pl.pallas_call(
        functools.partial(_spec_kernel, r=r, freq_pad=freq_pad),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_F, freq_pad), lambda i, s: (i, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * TILE_F, freq_pad),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE_F + HALO_ROWS, hop_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(chunks, wdft)
    return out[:, :f, :n_freq]


def wave_to_mel_pallas(y: jax.Array, sr: int, n_fft: int, hop: int, win: int,
                       n_mels: int, fmin: float = 0.0,
                       fmax: float | None = None) -> jax.Array:
    """(B, T) -> (B, T//hop, n_mels); matches dsp.stft.wave_to_mel."""
    assert n_fft % hop == 0
    r = n_fft // hop
    b, t = y.shape
    f = t // hop
    n_freq = n_fft // 2 + 1
    hop_pad = _pad_to(hop, LANE)
    freq_pad = _pad_to(n_freq, LANE)
    mel_pad = _pad_to(n_mels, LANE)

    # Reference framing: reflect pad (n_fft - hop)/2 both sides; frame p
    # covers padded samples [p*hop, p*hop + n_fft). With pad = 1.5*hop the
    # chunk grid is offset by hop/2: chunk q = padded[q*hop - hop/2 ...];
    # simplest exact mapping: pad by (n_fft - hop)/2 and chunk the padded
    # wave at stride hop starting from 0 with (r - 1) extra rows.
    pad = (n_fft - hop) // 2
    assert (2 * pad) % hop == 0, "framing grid requires hop | (n_fft - hop)"
    y_p = jnp.pad(y.astype(jnp.float32), [(0, 0), (pad, pad)], mode="reflect")
    n_hops = (t + 2 * pad) // hop          # = f + r - 1
    n_tiles = -(-f // TILE_F)
    rows_pad = n_tiles * TILE_F + HALO_ROWS

    chunks = y_p[:, : n_hops * hop].reshape(b, n_hops, hop)
    chunks = jnp.pad(chunks, [(0, 0), (0, rows_pad - n_hops), (0, hop_pad - hop)])

    wdft = jnp.asarray(_fused_basis(n_fft, hop, win))
    melb = jnp.asarray(_padded_mel_basis(sr, n_fft, n_mels, fmin, fmax))

    out = pl.pallas_call(
        functools.partial(_kernel, r=r, freq_pad=freq_pad),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # chunk rows stay off-chip
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_F, mel_pad), lambda i, s: (i, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * TILE_F, mel_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE_F + HALO_ROWS, hop_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(chunks, wdft, melb)
    return out[:, :f, :n_mels]


def wave_to_mel_fast(y: jax.Array, sr: int, n_fft: int, hop: int, win: int,
                     n_mels: int, fmin: float = 0.0,
                     fmax: float | None = None) -> jax.Array:
    """Inference-side featurization: Pallas on TPU, XLA elsewhere.

    NOT differentiable (the Pallas kernel has no VJP) — training uses the
    XLA matmul-DFT path which autodiffs.
    """
    if jax.default_backend() == "cpu":
        from quickvc_tpu.dsp.mel import mel_filterbank
        from quickvc_tpu.dsp.stft import wave_to_mel

        fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
        return wave_to_mel(y, fb, n_fft, hop, win)
    return wave_to_mel_pallas(y, sr, n_fft, hop, win, n_mels, fmin, fmax)
