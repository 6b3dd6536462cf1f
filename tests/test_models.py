"""Model-layer tests: shapes, invertibility, and structural invariants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quickvc_tpu.config import ModelConfig, QuickVCConfig
from quickvc_tpu.models import (
    MultiPeriodDiscriminator,
    ResBlock1,
    ResidualCouplingBlock,
    SynthesizerTrn,
    WaveNet,
)
from quickvc_tpu.models.decoders import (
    ISTFTGenerator,
    MultibandISTFTGenerator,
    MultistreamISTFTGenerator,
)
from quickvc_tpu.models.modules import CondNormalWN
from quickvc_tpu.ops.slicing import rand_slice_segments, slice_segments


SMALL = dict(initial_channel=32, resblock_kernel_sizes=(3, 7, 11),
             resblock_dilation_sizes=((1, 3, 5),) * 3, upsample_rates=(5, 4),
             upsample_initial_channel=64, upsample_kernel_sizes=(16, 16),
             gen_istft_n_fft=16, gen_istft_hop_size=4, subbands=4, gin_channels=16)


def small_model_config() -> ModelConfig:
    return ModelConfig(inter_channels=32, hidden_channels=32,
                       upsample_initial_channel=64, gin_channels=16,
                       unit_channels=24, enc_wn_layers=4)


class TestWaveNet:
    def test_shapes_and_conditioning(self, rng):
        m = WaveNet(hidden_channels=16, kernel_size=5, n_layers=4, gin_channels=8)
        x = jnp.asarray(rng.standard_normal((2, 20, 16)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((2, 1, 8)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x, g)
        y = m.apply(params, x, g)
        assert y.shape == (2, 20, 16)
        # Conditioning must matter.
        y2 = m.apply(params, x, g + 1.0)
        assert not np.allclose(np.asarray(y), np.asarray(y2))

    def test_uncond(self, rng):
        m = WaveNet(hidden_channels=16, n_layers=3, gin_channels=0)
        x = jnp.asarray(rng.standard_normal((1, 10, 16)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(params, x).shape == (1, 10, 16)


def test_resblock_preserves_shape(rng):
    m = ResBlock1(8, 3, (1, 3, 5))
    x = jnp.asarray(rng.standard_normal((2, 30, 8)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == x.shape


class TestFlow:
    def test_invertibility(self, rng):
        m = ResidualCouplingBlock(8, 16, 5, 4, 4, gin_channels=4)
        x = jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((2, 1, 4)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x, g)
        z = m.apply(params, x, g)
        x_rec = m.apply(params, z, g, reverse=True)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5, rtol=1e-4)

    def test_identity_at_init_modulo_flips(self, rng):
        """post convs are zero-init, so the flow is a permutation at init."""
        m = ResidualCouplingBlock(8, 16, 5, 2, 2, gin_channels=0)
        x = jnp.asarray(rng.standard_normal((1, 6, 8)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        z = np.asarray(m.apply(params, x))
        # 2 flows x flip => net permutation returns values unchanged as a set
        np.testing.assert_allclose(np.sort(z, axis=-1), np.sort(np.asarray(x), axis=-1),
                                   atol=1e-5, rtol=1e-4)


class TestCondNormalWN:
    def test_sample_statistics(self, rng):
        m = CondNormalWN(8, 16, 5, 2, 0)
        x = jnp.asarray(rng.standard_normal((2, 10, 12)).astype(np.float32))
        params = m.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x)
        s1, mu, logs = m.apply(params, x, rngs={"sample": jax.random.PRNGKey(2)})
        s2, _, _ = m.apply(params, x, rngs={"sample": jax.random.PRNGKey(3)})
        assert s1.shape == mu.shape == logs.shape == (2, 10, 8)
        assert not np.allclose(np.asarray(s1), np.asarray(s2))
        det, _, _ = m.apply(params, x, noise_scale=0.0)
        np.testing.assert_allclose(np.asarray(det), np.asarray(mu), atol=1e-6)


class TestSlicing:
    def test_slice_segments(self, rng):
        x = jnp.asarray(np.arange(2 * 10 * 3).reshape(2, 10, 3).astype(np.float32))
        out = slice_segments(x, jnp.asarray([2, 5]), 4)
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(x[0, 2:6]))
        np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(x[1, 5:9]))

    def test_rand_slice_in_bounds(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 50, 2)).astype(np.float32))
        seg, starts = rand_slice_segments(jax.random.PRNGKey(0), x, 32)
        assert seg.shape == (4, 32, 2)
        assert (np.asarray(starts) >= 0).all() and (np.asarray(starts) <= 18).all()


@pytest.mark.parametrize("cls,out_len,mb_shape", [
    # Single-band: (k-u)//2 padding arithmetic gives 20F+5 frames -> 80F+16.
    (ISTFTGenerator, 80 * 8 + 16, None),
    # 4-band variants: exact x80 per band (output_padding arithmetic), x4 bands.
    (MultibandISTFTGenerator, 320 * 8, (2, 80 * 8, 4)),
    (MultistreamISTFTGenerator, 320 * 8, (2, 320 * 8, 4)),
])
def test_decoder_output_lengths(rng, cls, out_len, mb_shape):
    m = cls(**SMALL)
    f = 8
    x = jnp.asarray(rng.standard_normal((2, f, 32)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((2, 1, 16)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x, g)
    y, y_mb = m.apply(params, x, g)
    assert y.shape == (2, out_len, 1)
    if mb_shape is not None:
        assert y_mb.shape == mb_shape


def test_discriminator_shapes(rng):
    m = MultiPeriodDiscriminator()
    y = jnp.asarray(rng.standard_normal((1, 10240, 1)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), y, y)
    logits_r, logits_g, fmap_r, fmap_g = m.apply(params, y, y + 0.01)
    assert len(logits_r) == len(logits_g) == 6
    # DiscriminatorS has 7 fmaps (6 convs + post), each DiscriminatorP has 6.
    assert len(fmap_r) == 6
    assert len(fmap_r[0]) == 7 and all(len(f) == 6 for f in fmap_r[1:])
    # identical inputs -> identical logits (shared per-discriminator weights)
    lr2, lg2, _, _ = m.apply(params, y, y)
    for a, b in zip(lr2, lg2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_discriminator_batch_pair_matches_two_pass(rng):
    """batch_pair=True (one real‖fake pass) is numerically identical to the
    reference's two separate passes — same params pytree, same outputs."""
    y = jnp.asarray(rng.standard_normal((2, 10240, 1)).astype(np.float32))
    y_hat = jnp.asarray(rng.standard_normal((2, 10240, 1)).astype(np.float32))
    m1 = MultiPeriodDiscriminator(width=0.25, batch_pair=True)
    m2 = MultiPeriodDiscriminator(width=0.25, batch_pair=False)
    params = m1.init(jax.random.PRNGKey(0), y, y_hat)
    out1 = m1.apply(params, y, y_hat)
    out2 = m2.apply(params, y, y_hat)  # same params work unchanged
    for t1, t2 in zip(jax.tree.leaves(out1), jax.tree.leaves(out2)):
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                                   rtol=1e-5, atol=1e-5)


class TestSynthesizer:
    def test_forward_and_infer(self, rng):
        mc = small_model_config()
        f = 40
        net = SynthesizerTrn(spec_channels=33, segment_size=8, model=mc)
        unit = jnp.asarray(rng.standard_normal((2, f, 24)).astype(np.float32))
        spec = jnp.asarray(rng.standard_normal((2, f, 33)).astype(np.float32))
        mel = jnp.asarray(rng.standard_normal((2, f, 80)).astype(np.float32))
        variables = net.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
             "slice": jax.random.PRNGKey(2)}, unit, spec, mel)
        y, y_mb, ids, (z, z_p, m_p, logs_p, m_q, logs_q) = net.apply(
            variables, unit, spec, mel,
            rngs={"sample": jax.random.PRNGKey(3), "slice": jax.random.PRNGKey(4)})
        assert y.shape == (2, 8 * 320, 1)
        assert z.shape == z_p.shape == m_p.shape == (2, f, 32)
        # inference path
        g_vec = net.apply(variables, mel, method=SynthesizerTrn.embed_speaker)
        wave = net.apply(variables, unit, g_vec, method=SynthesizerTrn.infer,
                         rngs={"sample": jax.random.PRNGKey(5)})
        assert wave.shape == (2, 320 * f, 1)

    def test_infer_deterministic_without_noise(self, rng):
        mc = small_model_config()
        net = SynthesizerTrn(spec_channels=33, segment_size=8, model=mc)
        f = 16
        unit = jnp.asarray(rng.standard_normal((1, f, 24)).astype(np.float32))
        spec = jnp.asarray(rng.standard_normal((1, f, 33)).astype(np.float32))
        mel = jnp.asarray(rng.standard_normal((1, f, 80)).astype(np.float32))
        variables = net.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
             "slice": jax.random.PRNGKey(2)}, unit, spec, mel)
        g_vec = net.apply(variables, mel, method=SynthesizerTrn.embed_speaker)
        w1 = net.apply(variables, unit, g_vec, 0.0, method=SynthesizerTrn.infer)
        w2 = net.apply(variables, unit, g_vec, 0.0, method=SynthesizerTrn.infer)
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=0)
