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


@pytest.mark.parametrize("t", [16000, 16003, 9995])
def test_fused_extractor_front_matches_xla(rng, t):
    """conv0+GroupNorm+GELU+conv1+GELU kernel == the flax stage chain."""
    from quickvc_tpu.models.hubert import FeatureExtractor
    from quickvc_tpu.ops.fused_extractor import fused_extractor_front

    fe = FeatureExtractor()
    p = fe.init(jax.random.PRNGKey(0), jnp.zeros((1, 2000, 1)))["params"]
    x = jnp.asarray(rng.standard_normal((2, t)).astype(np.float32) * 0.3)

    def golden_front(x, p):
        y = jax.lax.conv_general_dilated(
            x[..., None], p["conv0"]["kernel"], (5,), [(0, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"))
        m = jnp.mean(y, axis=1, keepdims=True)
        v = jnp.var(y, axis=1, keepdims=True)
        y = (y - m) / jnp.sqrt(v + 1e-5) * p["norm0"]["scale"] + p["norm0"]["bias"]
        y = jax.nn.gelu(y, approximate=False)
        y = jax.lax.conv_general_dilated(
            y, p["conv1"]["kernel"], (2,), [(0, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"))
        return jax.nn.gelu(y, approximate=False)

    golden = np.asarray(golden_front(x, p))
    ours = np.asarray(_pallas_interpret(
        fused_extractor_front, x, p["conv0"]["kernel"], p["norm0"]["scale"],
        p["norm0"]["bias"], p["conv1"]["kernel"]))
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("t", [70, 128, 257])
def test_fused_transformer_layer_matches_flax(rng, t):
    """Whole-layer kernel == models.hubert.TransformerLayer (post-norm)."""
    from quickvc_tpu.models.hubert import TransformerLayer
    from quickvc_tpu.ops.fused_transformer import fused_transformer_layer

    tl = TransformerLayer()
    p = tl.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 768)))["params"]
    x = jnp.asarray(rng.standard_normal((2, t, 768)).astype(np.float32) * 0.5)
    golden = np.asarray(tl.apply({"params": p}, x))
    ours = np.asarray(_pallas_interpret(fused_transformer_layer, x, p, 12))
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=2e-5, rtol=1e-4)


def test_fused_extractor_in_model_param_tree():
    """front_mode changes no parameter names/shapes/values."""
    from quickvc_tpu.models.hubert import FeatureExtractor

    a = FeatureExtractor().init(jax.random.PRNGKey(0), jnp.zeros((1, 2000, 1)))
    for mode in ("faststats", "pallas"):
        b = FeatureExtractor(front_mode=mode).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2000, 1)))
        assert jax.tree.structure(a) == jax.tree.structure(b)
        for xa, xb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


@pytest.mark.parametrize("t", [16000, 9995])
def test_faststats_front_matches_xla_in_model(rng, t):
    """front_mode='faststats' == default mode on the full extractor (f32)."""
    from quickvc_tpu.models.hubert import FeatureExtractor

    fe0 = FeatureExtractor()
    fe1 = FeatureExtractor(front_mode="faststats")
    p = fe0.init(jax.random.PRNGKey(0), jnp.zeros((1, 2000, 1)))
    x = jnp.asarray(rng.standard_normal((2, t, 1)).astype(np.float32) * 0.3)
    a = np.asarray(fe0.apply(p, x))
    b = np.asarray(fe1.apply(p, x))
    np.testing.assert_allclose(b, a, atol=5e-4, rtol=1e-3)


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


class TestFusedDiscConv:
    """conv5_lrelu (ops/fused_disc_conv.py): fwd + custom VJP vs XLA."""

    def test_forward_matches_xla(self, rng):
        from quickvc_tpu.ops.fused_disc_conv import (
            conv5_lrelu, conv5_lrelu_reference)

        n, rows, c_in, c_out = 3, 37, 256, 128
        x = jnp.asarray(rng.standard_normal((n, rows, c_in)).astype(np.float32) * 0.3)
        k = jnp.asarray(rng.standard_normal((5, c_in, c_out)).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.standard_normal((c_out,)).astype(np.float32) * 0.1)

        golden = np.asarray(conv5_lrelu_reference(x, k, b, 0.1))
        ours = np.asarray(_pallas_interpret(conv5_lrelu, x, k, b, 0.1))
        np.testing.assert_allclose(ours, golden, atol=2e-5, rtol=1e-5)

    def test_vjp_matches_xla(self, rng):
        from quickvc_tpu.ops.fused_disc_conv import (
            conv5_lrelu, conv5_lrelu_reference)

        n, rows, c_in, c_out = 2, 21, 128, 256
        x = jnp.asarray(rng.standard_normal((n, rows, c_in)).astype(np.float32) * 0.3)
        k = jnp.asarray(rng.standard_normal((5, c_in, c_out)).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.standard_normal((c_out,)).astype(np.float32) * 0.1)
        dy = jnp.asarray(rng.standard_normal((n, rows, c_out)).astype(np.float32))

        def loss_ref(x, k, b):
            return jnp.sum(conv5_lrelu_reference(x, k, b, 0.1) * dy)

        def loss_ours(x, k, b):
            return jnp.sum(conv5_lrelu(x, k, b, 0.1) * dy)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
        g_ours = _pallas_interpret(
            lambda: jax.grad(loss_ours, argnums=(0, 1, 2))(x, k, b))
        for a, c, name in zip(g_ours, g_ref, ("dx", "dw", "db")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=5e-5, rtol=1e-4, err_msg=name)


def test_fused_spec_halo_matches_xla(rng):
    """wave_to_spec_halo_pallas (compact-transfer training featurization)
    == dsp.stft.wave_to_spec_halo at f32 rounding."""
    from quickvc_tpu.dsp.stft import wave_to_spec_halo
    from quickvc_tpu.ops.fused_mel import wave_to_spec_halo_pallas

    n_fft, hop, win = 1280, 320, 1280
    pad = (n_fft - hop) // 2
    t = 40 * hop
    y = rng.standard_normal((2, t + 2 * pad)).astype(np.float32) * 0.1
    golden = np.asarray(wave_to_spec_halo(jnp.asarray(y), n_fft, hop, win))
    ours = np.asarray(_pallas_interpret(
        wave_to_spec_halo_pallas, jnp.asarray(y), n_fft, hop, win))
    assert ours.shape == golden.shape == (2, 40, 641)
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=2e-4)
