"""Pallas TPU kernel: fused polar-decode + inverse-STFT head.

Fuses the decoder's waveform head (reference models.py:399-401 + torchaudio
InverseSpectrogram): ``exp(log_mag)``/``pi*sin(phase)`` polar decode, the
windowed inverse real-DFT (n_fft=16 -> a tiny matmul), hop-4 overlap-add,
and squared-window envelope normalization — one kernel, intermediates never
touch HBM.

Key restructuring: OLA is folded INTO the matmul. Output hop-chunk p of the
(center-trimmed) waveform is

   y[p] = sum_j frames[p + R/2 - j][j*hop : (j+1)*hop]   (R = n_fft/hop)
        = sum_j (re[p + R/2 - j] @ Cr_j + im[p + R/2 - j] @ Ci_j)

i.e. R accumulated (freq)-contraction matmuls over frame-shifted spectra —
no scatter, no shifted adds, no intermediate frame buffer.

TPU layout choices (learned the hard way on real Mosaic):
- spectra are fed FREQ-MAJOR ``(B, n_freq, Frames)`` so the big Frames axis
  sits on the 128-lane dim: HBM DMA slices are then 128-aligned windows
  (Mosaic requires minor-dim slice alignment), and the tiny freq axis (9)
  rides the sublane dim;
- each grid program (batch row x frame tile) DMAs its haloed window
  ``[t*TILE, t*TILE + TILE + 128)`` into VMEM scratch; the R frame shifts
  are ``pltpu.roll`` lane rotations; the R matmuls contract the freq dim
  via ``dot_general`` and accumulate;
- env / out are (1, TILE, hop) VMEM blocks (hop = minor dim, full).

Equivalence to ``dsp.istft.polar_inverse_stft`` is tested in
tests/test_pallas.py (interpret mode on CPU; compiled path exercised by
bench.py on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quickvc_tpu.dsp.istft import _inverse_dft_matrices, _ola_envelope

TILE_P = 2048   # output hop-chunks per program
HALO = 128      # extra lanes fetched per window (covers the R-1 frame halo)


def _round8(n: int) -> int:
    return -(-n // 8) * 8


@functools.lru_cache(maxsize=None)
def _basis_chunks(n_fft: int, hop: int):
    """(r, freq_pad, hop) windowed-irDFT basis chunks for re and im.

    The freq axis is padded to a sublane multiple (Mosaic memref slices must
    be 8-aligned); padded basis rows are zero so padded spectrum rows
    contribute exactly nothing.
    """
    basis_re, basis_im = _inverse_dft_matrices(n_fft)  # (freq, n_fft)
    r = n_fft // hop
    n_freq = n_fft // 2 + 1
    fp = _round8(n_freq)
    wr = np.zeros((r, fp, hop), np.float32)
    wi = np.zeros((r, fp, hop), np.float32)
    for j in range(r):
        wr[j, :n_freq] = basis_re[:, j * hop : (j + 1) * hop]
        wi[j, :n_freq] = basis_im[:, j * hop : (j + 1) * hop]
    return wr, wi


def _kernel(mag_hbm, phase_hbm, env_ref, wr_ref, wi_ref, out_ref,
            mag_s, phase_s, sems, *, r, hop):
    i = pl.program_id(0)
    t = pl.program_id(1)
    start = t * TILE_P  # 128-aligned lane offset into the padded frame axis

    cp_m = pltpu.make_async_copy(
        mag_hbm.at[i, :, pl.ds(start, TILE_P + HALO)], mag_s, sems.at[0])
    cp_p = pltpu.make_async_copy(
        phase_hbm.at[i, :, pl.ds(start, TILE_P + HALO)], phase_s, sems.at[1])
    cp_m.start()
    cp_p.start()
    cp_m.wait()
    cp_p.wait()

    mag = jnp.exp(mag_s[:])                      # (n_freq, TILE_P + HALO)
    phase = jnp.pi * jnp.sin(phase_s[:])
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)

    y = None
    for j in range(r):
        s0 = r - 1 - j  # frame shift for this basis chunk
        # left-shift by s0 == circular roll by L - s0 (roll wants shift >= 0);
        # wrapped elements land beyond TILE_P and are sliced away
        length = TILE_P + HALO
        re_j = pltpu.roll(re, shift=(length - s0) % length, axis=1)[:, :TILE_P]
        im_j = pltpu.roll(im, shift=(length - s0) % length, axis=1)[:, :TILE_P]
        # contract the freq (sublane) dim: (freq, P) x (freq, hop) -> (P, hop)
        # precision=HIGHEST: Mosaic's default f32 dot rounds multiplicands
        # to bf16 (round-5 on-TPU parity gate); audio synthesis should not
        # carry ~4e-3 relative waveform error from a 9-term DFT
        acc = jax.lax.dot_general(
            re_j, wr_ref[j], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        acc = acc + jax.lax.dot_general(
            im_j, wi_ref[j], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        y = acc if y is None else y + acc
    out_ref[:] = y[None] * env_ref[:]


def polar_inverse_stft_pallas(log_mag: jax.Array, phase: jax.Array,
                              n_fft: int, hop: int) -> jax.Array:
    """Fused head: (B, Frame, Freq) x2 -> (B, hop*(Frame-1)).

    Matches ``dsp.istft.polar_inverse_stft`` (torch.istft center=True
    semantics: OLA trimmed by n_fft/2 on both sides).
    """
    assert n_fft % hop == 0
    r = n_fft // hop
    assert r % 2 == 0, "center trim assumes hop | n_fft/2"
    assert r - 1 <= HALO
    n_freq = n_fft // 2 + 1
    b, f, _ = log_mag.shape
    log_mag = log_mag.astype(jnp.float32)
    phase = phase.astype(jnp.float32)

    p_out = f - 1                      # trimmed output chunks
    half_chunks = r // 2
    n_tiles = -(-p_out // TILE_P)
    p_pad = n_tiles * TILE_P

    # Output chunk p (after center trim) reads frames p + half - j for
    # j = 0..R-1. Left-pad by (r-1-half) so access p+left+... becomes
    # row p + (r-1-j) in the padded array; right-pad to the aligned window
    # extent. Padded frames carry ~zero magnitude (exp(-30)), contributing
    # nothing — exactly like out-of-range frames in the reference OLA.
    left = r - 1 - half_chunks
    right = p_pad + HALO - left - f
    fp = _round8(n_freq)  # sublane-aligned freq extent (zero basis rows)
    pad_cfg = [(0, 0), (left, right), (0, fp - n_freq)]
    log_mag_p = jnp.pad(log_mag, pad_cfg, constant_values=-30.0)
    phase_p = jnp.pad(phase, pad_cfg)
    # freq-major: frames on the lane dim
    log_mag_p = log_mag_p.transpose(0, 2, 1)     # (B, freq_pad, F_pad)
    phase_p = phase_p.transpose(0, 2, 1)

    env_inv = _ola_envelope(f, n_fft, hop)[n_fft // 2 : -(n_fft // 2)]
    env_inv = np.pad(env_inv, (0, (p_pad - p_out) * hop))
    env = jnp.asarray(env_inv.reshape(1, p_pad, hop))
    wr, wi = _basis_chunks(n_fft, hop)

    out = pl.pallas_call(
        functools.partial(_kernel, r=r, hop=hop),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # spectra stay off-chip
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, TILE_P, hop), lambda i, t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_P, hop), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, hop), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((fp, TILE_P + HALO), jnp.float32),
            pltpu.VMEM((fp, TILE_P + HALO), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(log_mag_p, phase_p, env, jnp.asarray(wr), jnp.asarray(wi))
    return out.reshape(b, p_pad * hop)[:, : p_out * hop]
