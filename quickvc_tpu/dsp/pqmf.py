"""Pseudo-QMF filterbank (4-band) — filter design in numpy, compute in XLA.

Reference parity: ``pqmf.py`` in the reference (Kaiser-window prototype,
62 taps, cutoff 0.15, beta 9; cosine-modulated analysis/synthesis banks;
analysis = pad+conv then stride-``subbands`` decimation; synthesis =
zero-stuffing upsample x subbands then pad+conv).

TPU-first: decimation folds into a strided convolution; the zero-stuffing
upsample folds into an input-dilated (``lhs_dilation``) convolution — both
single XLA conv ops that map onto the MXU. Layout is channels-last
``(B, T, Band)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def design_prototype_filter(taps: int = 62, cutoff_ratio: float = 0.15, beta: float = 9.0) -> np.ndarray:
    """Kaiser-window lowpass prototype, length taps+1 (standard design, cf. reference pqmf.py:16-44)."""
    assert taps % 2 == 0
    assert 0.0 < cutoff_ratio < 1.0
    omega_c = np.pi * cutoff_ratio
    n = np.arange(taps + 1) - 0.5 * taps
    with np.errstate(invalid="ignore"):
        h_i = np.sin(omega_c * n) / (np.pi * n)
    h_i[taps // 2] = cutoff_ratio  # sinc limit at n=0
    return h_i * np.kaiser(taps + 1, beta)


@functools.lru_cache(maxsize=None)
def _modulated_filters(subbands: int, taps: int, cutoff_ratio: float, beta: float):
    """Cosine-modulated analysis/synthesis banks, each (subbands, taps+1)."""
    h_proto = design_prototype_filter(taps, cutoff_ratio, beta)
    t = np.arange(taps + 1) - (taps - 1) / 2.0
    k = np.arange(subbands)[:, None]
    arg = (2 * k + 1) * (np.pi / (2 * subbands)) * t[None, :]
    sign = ((-1.0) ** k) * np.pi / 4.0
    h_analysis = 2.0 * h_proto[None, :] * np.cos(arg + sign)
    h_synthesis = 2.0 * h_proto[None, :] * np.cos(arg - sign)
    return h_analysis.astype(np.float32), h_synthesis.astype(np.float32)


class PQMFBank:
    """Stateless PQMF analysis/synthesis over channels-last waveforms."""

    def __init__(self, subbands: int = 4, taps: int = 62, cutoff_ratio: float = 0.15, beta: float = 9.0):
        self.subbands = subbands
        self.taps = taps
        h_a, h_s = _modulated_filters(subbands, taps, cutoff_ratio, beta)
        # lax conv kernels, channels-last spec ('NHC','HIO','NHC'):
        self.analysis_kernel = jnp.asarray(h_a.T[:, None, :])      # (taps+1, 1, subbands)
        self.synthesis_kernel = jnp.asarray(h_s.T[:, :, None])     # (taps+1, subbands, 1)

    def analysis(self, x: jax.Array) -> jax.Array:
        """(B, T, 1) -> (B, T // subbands, subbands)."""
        pad = self.taps // 2
        return jax.lax.conv_general_dilated(
            x, self.analysis_kernel,
            window_strides=(self.subbands,),
            padding=[(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )

    def synthesis(self, x: jax.Array) -> jax.Array:
        """(B, T', subbands) -> (B, T' * subbands, 1).

        Zero-stuff upsample x subbands (scaled by subbands, cf. reference
        pqmf.py:113-116) folded into one input-dilated conv.
        """
        s, pad = self.subbands, self.taps // 2
        return jax.lax.conv_general_dilated(
            x * float(s), self.synthesis_kernel,
            window_strides=(1,),
            padding=[(pad, pad + s - 1)],
            lhs_dilation=(s,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
