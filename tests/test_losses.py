"""Loss-function unit tests: formulas pinned against torch equivalents."""

import numpy as np
import torch

import jax.numpy as jnp

from quickvc_tpu.losses import (
    discriminator_loss,
    feature_loss,
    generator_loss,
    kl_loss,
    multi_resolution_stft_loss,
    subband_stft_loss,
)


def test_lsgan_losses_match_torch(rng):
    logits_r = [rng.standard_normal((2, 50)).astype(np.float32) for _ in range(3)]
    logits_g = [rng.standard_normal((2, 50)).astype(np.float32) for _ in range(3)]
    d_loss, r_l, g_l = discriminator_loss([jnp.asarray(x) for x in logits_r],
                                          [jnp.asarray(x) for x in logits_g])
    golden = sum(torch.nn.functional.mse_loss(torch.ones_like(torch.from_numpy(r)), torch.from_numpy(r))
                 + torch.nn.functional.mse_loss(torch.zeros_like(torch.from_numpy(g)), torch.from_numpy(g))
                 for r, g in zip(logits_r, logits_g))
    np.testing.assert_allclose(float(d_loss), float(golden), rtol=1e-6)

    gen_total, _ = generator_loss([jnp.asarray(x) for x in logits_g])
    golden_g = sum(torch.nn.functional.mse_loss(torch.ones_like(torch.from_numpy(g)), torch.from_numpy(g))
                   for g in logits_g)
    np.testing.assert_allclose(float(gen_total), float(golden_g), rtol=1e-6)


def test_feature_loss_matches_torch(rng):
    fr = [[rng.standard_normal((1, 10, 4)).astype(np.float32) for _ in range(2)]]
    fg = [[rng.standard_normal((1, 10, 4)).astype(np.float32) for _ in range(2)]]
    ours = feature_loss([[jnp.asarray(x) for x in fr[0]]], [[jnp.asarray(x) for x in fg[0]]])
    golden = 2.0 * sum(torch.nn.functional.l1_loss(torch.from_numpy(a), torch.from_numpy(b))
                       for a, b in zip(fr[0], fg[0]))
    np.testing.assert_allclose(float(ours), float(golden), rtol=1e-6)


def test_kl_loss_matches_torch(rng):
    shape = (2, 20, 8)
    z_p, logs_q, m_p, logs_p = [rng.standard_normal(shape).astype(np.float32) * 0.3
                                for _ in range(4)]
    ours = kl_loss(*[jnp.asarray(x) for x in (z_p, logs_q, m_p, logs_p)])
    tzp, tlq, tmp, tlp = map(torch.from_numpy, (z_p, logs_q, m_p, logs_p))
    kl = tlp - tlq - 0.5 + 0.5 * (tzp - tmp) ** 2 * torch.exp(-2.0 * tlp)
    np.testing.assert_allclose(float(ours), float(kl.mean()), rtol=1e-5)


def test_mr_stft_loss_finite_and_positive(rng):
    x = rng.standard_normal((2, 2560)).astype(np.float32) * 0.1
    y = x + rng.standard_normal((2, 2560)).astype(np.float32) * 0.01
    sc, mag = multi_resolution_stft_loss(jnp.asarray(x), jnp.asarray(y),
                                         (384, 683, 171), (30, 60, 10), (150, 300, 60))
    assert np.isfinite(float(sc)) and float(sc) > 0
    assert np.isfinite(float(mag)) and float(mag) > 0
    # identical signals -> zero losses
    sc0, mag0 = multi_resolution_stft_loss(jnp.asarray(x), jnp.asarray(x),
                                           (384,), (30,), (150,))
    assert float(sc0) < 1e-6 and float(mag0) < 1e-6


def test_subband_stft_loss_crops_length_mismatch(rng):
    y_mb = rng.standard_normal((2, 640, 4)).astype(np.float32) * 0.1
    y_hat_mb = rng.standard_normal((2, 660, 4)).astype(np.float32) * 0.1
    val = subband_stft_loss(jnp.asarray(y_mb), jnp.asarray(y_hat_mb),
                            (171,), (10,), (60,))
    assert np.isfinite(float(val))
