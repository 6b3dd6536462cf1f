"""Core NN modules: WaveNet block, HiFi-GAN ResBlock, flow layers, encoders.

Behavioral parity targets (channels-last layouts here, ``(B, T, C)``):
- ``WaveNet``  == reference ``modules.WN`` (modules.py:37-122): dilation-1
  k=5 convs, gated tanh/sigmoid unit with additive conditioning computed for
  all layers by one SegFC, res/skip split, skip-sum output.
- ``ResBlock1`` == reference ``modules.ResBlock1`` (modules.py:128-160).
- ``ResidualCouplingLayer``/``Flip``/``ResidualCouplingBlock`` ==
  reference flow (modules.py:165-224, models.py:17-51): shift-only affine
  coupling, invertible.
- ``CondNormalWN`` == reference ``models.CondNormalWN`` (models.py:54-95):
  SegFC -> WN -> SegFC producing (mu, logs); reparameterized sample.

The per-layer loop in WaveNet is a static Python loop — XLA unrolls and
fuses it; layer count (16) is fixed by config.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from quickvc_tpu.models.layers import Conv1d, WNConv1d, leaky_relu


class WNLayer(nn.Module):
    """One WaveNet layer: dilated-1 conv -> gated unit (+cond) -> res/skip.

    All layers are shaped identically (res_skip always 2h wide; the reference
    narrows the last layer to h, modules.py:66 — here the res half of the
    last layer is simply unused, which is semantically identical) so the
    stack can be a single ``nn.scan``: a 16x smaller XLA graph.
    """

    hidden_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, carry, g_l):
        x, out = carry
        h = self.hidden_channels
        x_in = WNConv1d(2 * h, self.kernel_size, name="in")(x) + g_l
        acts = jnp.tanh(x_in[..., :h]) * jax.nn.sigmoid(x_in[..., h:])
        res_skip = WNConv1d(2 * h, 1, name="res_skip")(acts)
        return (x + res_skip[..., :h], out + res_skip[..., h:]), None


class WaveNet(nn.Module):
    """Non-causal WaveNet stack with gated units and global conditioning.

    The per-layer loop is an ``nn.scan`` over stacked parameters — compile
    time and HLO size are O(1) in depth. Conditioning for every layer is
    computed by one SegFC (reference modules.py:54) and sliced per layer.
    """

    hidden_channels: int
    kernel_size: int = 5
    n_layers: int = 16
    gin_channels: int = 0
    # lax.scan unroll factor; 0 = fully unroll. The param pytree stays
    # scan-stacked either way. Full unroll lets XLA fuse across layers in
    # the BACKWARD pass: 15.6 -> 12.9 ms fwd+bwd at batch 64 x 512 frames
    # (scripts/bwd_experiments.py; partial unroll=4 is pathological, 25 ms).
    unroll: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, g: jax.Array | None = None) -> jax.Array:
        h, L = self.hidden_channels, self.n_layers
        b, t = x.shape[0], x.shape[1]
        if self.gin_channels != 0:
            assert g is not None
            g_all = WNConv1d(2 * h * L, 1, name="cond_layer")(g)  # (B, Tg, L*2h)
            tg = g_all.shape[1]
            g_stack = g_all.reshape(b, tg, L, 2 * h).transpose(2, 0, 1, 3)
            if tg == 1:
                g_stack = jnp.broadcast_to(g_stack, (L, b, 1, 2 * h))
        else:
            g_stack = jnp.zeros((L, 1, 1, 2 * h), x.dtype)

        scan = nn.scan(
            WNLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0,
            length=L,
            unroll=self.unroll if self.unroll > 0 else L,
        )
        (x_final, output), _ = scan(h, self.kernel_size, name="layers")(
            (x, jnp.zeros_like(x)), g_stack)
        return output


class ResBlock1(nn.Module):
    """HiFi-GAN MRF residual block: 3 x [LReLU-DilConv-LReLU-Conv] with residual."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from quickvc_tpu.models.layers import normal_init
        for j, d in enumerate(self.dilations):
            xt = leaky_relu(x)
            xt = WNConv1d(self.channels, self.kernel_size, dilation=d,
                          kernel_init=normal_init(), name=f"conv1_{j}")(xt)
            xt = leaky_relu(xt)
            xt = WNConv1d(self.channels, self.kernel_size,
                          kernel_init=normal_init(), name=f"conv2_{j}")(xt)
            x = x + xt
        return x


class ResidualCouplingLayer(nn.Module):
    """Shift-only affine coupling: x1' = x1 +/- NN(x0, g)."""

    channels: int
    hidden_channels: int
    kernel_size: int = 5
    n_layers: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, g: jax.Array | None = None, reverse: bool = False) -> jax.Array:
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0)
        h = WaveNet(self.hidden_channels, self.kernel_size, self.n_layers,
                    self.gin_channels, name="enc")(h, g)
        # post conv zero-initialized, weight AND bias (modules.py:196-197),
        # so the flow starts as an identity (modulo flips)
        m = Conv1d(half, 1, kernel_init=nn.initializers.zeros,
                   bias_init=nn.initializers.zeros, name="post")(h)
        x1 = x1 - m if reverse else x1 + m
        return jnp.concatenate([x0, x1], axis=-1)


def flip_features(x: jax.Array) -> jax.Array:
    """Flow 'Flip': reverse the feature axis (modules.py:165-170)."""
    return jnp.flip(x, axis=-1)


class ResidualCouplingBlock(nn.Module):
    """Chain of n_flows x (coupling + flip); invertible via reverse=True."""

    channels: int
    hidden_channels: int
    kernel_size: int = 5
    n_layers: int = 4
    n_flows: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, g: jax.Array | None = None, reverse: bool = False) -> jax.Array:
        layers = [
            ResidualCouplingLayer(self.channels, self.hidden_channels, self.kernel_size,
                                  self.n_layers, self.gin_channels, name=f"flow_{i}")
            for i in range(self.n_flows)
        ]
        if not reverse:
            for layer in layers:
                x = layer(x, g, reverse=False)
                x = flip_features(x)
        else:
            for layer in reversed(layers):
                x = flip_features(x)
                x = layer(x, g, reverse=True)
        return x


class CondNormalWN(nn.Module):
    """Conditional Gaussian parameterized by SegFC -> WaveNet -> SegFC.

    Returns (sample, mu, logs). The sample uses the 'sample' PRNG collection;
    pass ``noise_scale=0.0`` for a deterministic mu output.
    """

    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    n_layers: int = 16
    gin_channels: int = 0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        g: jax.Array | None = None,
        noise_scale: float = 1.0,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        h = Conv1d(self.hidden_channels, 1, name="pre")(x)
        h = WaveNet(self.hidden_channels, self.kernel_size, self.n_layers,
                    self.gin_channels, name="enc")(h, g)
        params = Conv1d(2 * self.out_channels, 1, name="proj")(h)
        mu, logs = params[..., : self.out_channels], params[..., self.out_channels :]
        if noise_scale != 0.0:
            eps = jax.random.normal(self.make_rng("sample"), mu.shape, mu.dtype)
            sample = mu + eps * jnp.exp(logs) * noise_scale
        else:
            sample = mu
        return sample, mu, logs
