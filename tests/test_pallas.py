"""Pallas kernel equivalence tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from quickvc_tpu.dsp.istft import polar_inverse_stft


def _pallas_interpret(fn, *args, **kwargs):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return fn(*args, **kwargs)


@pytest.mark.parametrize("shape", [(2, 41), (3, 128), (1, 513)])
def test_fused_istft_matches_xla(rng, shape):
    from quickvc_tpu.ops.fused_istft import polar_inverse_stft_pallas

    b, f = shape
    log_mag = rng.standard_normal((b, f, 9)).astype(np.float32) * 0.5
    phase = rng.standard_normal((b, f, 9)).astype(np.float32)

    golden = np.asarray(polar_inverse_stft(jnp.asarray(log_mag), jnp.asarray(phase), 16, 4))
    ours = np.asarray(_pallas_interpret(
        polar_inverse_stft_pallas, jnp.asarray(log_mag), jnp.asarray(phase), 16, 4))
    assert ours.shape == golden.shape == (b, (f - 1) * 4)
    np.testing.assert_allclose(ours, golden, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("shape", [(2, 10240), (1, 163840), (3, 81920)])
def test_fused_mel_matches_xla(rng, shape):
    from quickvc_tpu.dsp.mel import mel_filterbank
    from quickvc_tpu.dsp.stft import wave_to_mel
    from quickvc_tpu.ops.fused_mel import wave_to_mel_pallas

    b, t = shape
    y = rng.standard_normal((b, t)).astype(np.float32) * 0.4
    fb = jnp.asarray(mel_filterbank(16000, 1280, 80))
    golden = np.asarray(wave_to_mel(jnp.asarray(y), fb, 1280, 320, 1280))
    ours = np.asarray(_pallas_interpret(
        wave_to_mel_pallas, jnp.asarray(y), 16000, 1280, 320, 1280, 80))
    assert ours.shape == golden.shape == (b, t // 320, 80)
    np.testing.assert_allclose(ours, golden, atol=2e-3, rtol=2e-3)


def test_fused_mel_non_multiple_length(rng):
    """Arbitrary wave lengths (not hop multiples) match the XLA featurizer."""
    from quickvc_tpu.dsp.mel import mel_filterbank
    from quickvc_tpu.dsp.stft import wave_to_mel
    from quickvc_tpu.ops.fused_mel import wave_to_mel_pallas

    t = 16000 + 123
    y = rng.standard_normal((1, t)).astype(np.float32) * 0.4
    fb = jnp.asarray(mel_filterbank(16000, 1280, 80))
    golden = np.asarray(wave_to_mel(jnp.asarray(y), fb, 1280, 320, 1280))
    ours = np.asarray(_pallas_interpret(
        wave_to_mel_pallas, jnp.asarray(y), 16000, 1280, 320, 1280, 80))
    n = min(golden.shape[1], ours.shape[1])
    np.testing.assert_allclose(ours[:, :n], golden[:, :n], atol=2e-3, rtol=2e-3)
