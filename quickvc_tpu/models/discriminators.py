"""HiFi-GAN discriminators (MPD = 1 x scale + 5 x period).

Parity targets: reference models.py:418-504. Channels-last layouts:
waveforms are (B, T, 1); DiscriminatorP reshapes to (B, T/p, p, 1) NHWC and
runs (5,1)-kernel strided Conv2d stacks; DiscriminatorS runs grouped Conv1d
stacks. All convs weight-normalized (torch weight_norm dim=0).

Returns per-discriminator logits plus feature maps for the feature-matching
loss; layouts of fmaps only need to be consistent between real/fake passes.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from quickvc_tpu.models.layers import WNConv1d, leaky_relu, _torch_conv_init


class WNConv2d(nn.Module):
    """Weight-normalized 2-D conv, NHWC, torch weight_norm dim=0 (per out ch)."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        init = _torch_conv_init(kh * kw, in_ch)
        v = self.param("v", init, (kh, kw, in_ch, self.features))
        g = self.param("g", lambda key, shape: jnp.linalg.norm(
            init(key, (kh, kw, in_ch, self.features)).reshape(-1, self.features), axis=0),
            (self.features,))
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True) + 1e-12)
        kernel = (g[None, None, None, :] / norm) * v
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=self.strides,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        bias = self.param("bias", init, (self.features,))
        return y + bias.astype(y.dtype)


class DiscriminatorP(nn.Module):
    """Period discriminator: fold wave to (T/p, p) 2-D, 5-conv stack + post.

    ``width`` scales the channel ladder (default 1.0 = reference sizes
    32/128/512/1024); tests use narrow stacks to bound CPU compile time.
    """

    period: int
    kernel_size: int = 5
    stride: int = 3
    width: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, list[jax.Array]]:
        fmap = []
        b, t, _ = x.shape
        p = self.period
        if t % p != 0:
            n_pad = p - (t % p)
            x = jnp.pad(x, [(0, 0), (0, n_pad), (0, 0)], mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // p, p, 1)
        pad = (self.kernel_size - 1) // 2
        chans = [max(4, int(c * self.width)) for c in (32, 128, 512, 1024)]  # ref models.py:426-430
        for ch in chans:
            x = WNConv2d(ch, (self.kernel_size, 1), (self.stride, 1), (pad, 0))(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = WNConv2d(chans[-1], (self.kernel_size, 1), (1, 1), (pad, 0))(x)
        x = leaky_relu(x)
        fmap.append(x)
        x = WNConv2d(1, (3, 1), (1, 1), (1, 0))(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator: grouped wide-kernel Conv1d stack + post."""

    width: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, list[jax.Array]]:
        fmap = []
        specs = [
            (16, 15, 1, 1, 7),
            (64, 41, 4, 4, 20),
            (256, 41, 4, 16, 20),
            (1024, 41, 4, 64, 20),
            (1024, 41, 4, 256, 20),
            (1024, 5, 1, 1, 2),
        ]
        for ch, k, s, groups, pad in specs:
            # width must keep every channel count a multiple of its group
            # count (powers of 1/2 down to 1/4 are safe).
            ch = int(ch * self.width)
            x = WNConv1d(ch, k, stride=s, groups=groups, padding=pad)(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = WNConv1d(1, 3, padding=1)(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """1 x DiscriminatorS + DiscriminatorP for periods (2, 3, 5, 7, 11).

    ``batch_pair=True`` (default) runs each sub-discriminator ONCE on
    real‖fake concatenated along the batch axis instead of twice — convs
    and reflect-pads are batch-parallel so the numerics are identical,
    but the MXU sees 2x-larger matmuls and half the kernel count
    (reference runs two passes, models.py:492-504). The call-time ``pair``
    argument overrides the field: pairing wins when BOTH halves need
    gradients (the D-phase param grad) but loses when only the fake half
    is differentiated (the G-phase input grad pulls useless cotangents
    through the real half) — measured in scripts/disc_pair_ab.py, so
    train/step.py passes pair=True for D and pair=False for G.
    """

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    width: float = 1.0
    batch_pair: bool = True

    @nn.compact
    def __call__(self, y: jax.Array, y_hat: jax.Array, pair: bool | None = None):
        discs: list[Callable] = [DiscriminatorS(self.width, name="disc_s")]
        discs += [DiscriminatorP(p, width=self.width, name=f"disc_p{p}") for p in self.periods]
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        if self.batch_pair if pair is None else pair:
            b = y.shape[0]
            pair = jnp.concatenate([y, y_hat], axis=0)
            for d in discs:
                logit, fmap = d(pair)
                y_d_rs.append(logit[:b])
                y_d_gs.append(logit[b:])
                fmap_rs.append([f[:b] for f in fmap])
                fmap_gs.append([f[b:] for f in fmap])
        else:
            for d in discs:
                logit_r, fmap_r = d(y)
                logit_g, fmap_g = d(y_hat)
                y_d_rs.append(logit_r)
                y_d_gs.append(logit_g)
                fmap_rs.append(fmap_r)
                fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
