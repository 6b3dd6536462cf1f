"""HuBERT-soft content encoder (flax) — wave -> 256-dim unit series.

The reference depends on the external ``bshall/hubert`` PyTorch model via
``torch.hub.load`` (reference convert.py:44, dataset/encode.py:16); its
``.units(wav)`` output feeds the entire VC system. This is a TPU-native
implementation of the same architecture (HuBERT-base + soft projection):

- 7-layer CNN feature extractor (512 ch; strides 5,2,2,2,2,2,2 = 320x
  downsample; GroupNorm after the first conv; GELU),
- feature projection LayerNorm(512) -> Linear(768),
- positional conv embedding (k=128, groups=16, weight-norm dim=2, GELU,
  trailing-sample trim), residual add,
- LayerNorm + 12 post-norm transformer layers (768 d, 12 heads, 3072 FFN,
  GELU) — standard MHA; sequences at 50 Hz fit on-chip trivially,
- soft projection Linear(768 -> 256).

``units()`` pads the wave by (400-320)/2 = 40 samples on both sides first,
like the torch implementation. Weight porting from the released
``hubert-soft`` checkpoint lives in ``utils/hubert_port.py``; parity is
tested against a torch replica with matched random weights (no network
access needed).

Layout: wave (B, T) -> units (B, Frame, 256), all channels-last.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from quickvc_tpu.models.layers import Conv1d, Dense


class FeatureExtractor(nn.Module):
    """Waveform (B, T, 1) -> features (B, T/320, channels)."""

    channels: int = 512

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.channels
        x = Conv1d(c, 10, stride=5, padding="valid", use_bias=False, name="conv0")(x)
        # GroupNorm(512, 512) == per-channel instance norm over time
        x = nn.GroupNorm(num_groups=c, epsilon=1e-5, name="norm0")(x)
        x = jax.nn.gelu(x, approximate=False)
        for i in range(1, 5):
            x = Conv1d(c, 3, stride=2, padding="valid", use_bias=False, name=f"conv{i}")(x)
            x = jax.nn.gelu(x, approximate=False)
        for i in range(5, 7):
            x = Conv1d(c, 2, stride=2, padding="valid", use_bias=False, name=f"conv{i}")(x)
            x = jax.nn.gelu(x, approximate=False)
        return x


class FeatureProjection(nn.Module):
    embed_dim: int = 768

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return Dense(self.embed_dim, name="projection")(x)


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding, weight-norm over dim=2 (kernel pos)."""

    embed_dim: int = 768
    kernel_size: int = 128
    groups: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d, k, g = self.embed_dim, self.kernel_size, self.groups
        # torch weight (out, in/g, k) with weight_norm dim=2: one scale per
        # kernel position, norm over (out, in/g). Our storage (k, in/g, out).
        v = self.param("v", nn.initializers.normal(0.02), (k, d // g, d))
        gn = self.param("g", nn.initializers.ones, (k,))
        norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2), keepdims=True) + 1e-12)
        kernel = (gn[:, None, None] / norm) * v
        bias = self.param("bias", nn.initializers.zeros, (d,))
        pad = k // 2
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1,), [(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=g,
        ) + bias.astype(x.dtype)
        y = y[:, :-1, :]  # even kernel: trim trailing sample (HuBERT convention)
        return jax.nn.gelu(y, approximate=False)


class MultiHeadAttention(nn.Module):
    """torch nn.MultiheadAttention semantics (combined qkv projection)."""

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d, h = self.embed_dim, self.num_heads
        hd = d // h
        w_in = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (3 * d, d))
        b_in = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        qkv = x @ w_in.T.astype(x.dtype) + b_in.astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # Pallas fused attention in packed (B, T, H*D) layout: the (T, T)
        # score matrices live in VMEM per batch item instead of
        # round-tripping HBM, and no head transpose ever materializes — the
        # transformer is otherwise bandwidth-bound at these lengths
        # (BENCH.md roofline).
        from quickvc_tpu.ops.fused_attention import fused_attention_packed

        out = fused_attention_packed(q, k, v, num_heads=h,
                                     scale=1.0 / float(np.sqrt(hd)))
        return Dense(d, name="out_proj")(out)


class TransformerLayer(nn.Module):
    """Post-norm transformer encoder layer (torch TransformerEncoderLayer default)."""

    embed_dim: int = 768
    num_heads: int = 12
    ffn_dim: int = 3072

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        a = MultiHeadAttention(self.embed_dim, self.num_heads, name="self_attn")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + a)
        f = Dense(self.ffn_dim, name="linear1")(x)
        f = jax.nn.gelu(f, approximate=False)
        f = Dense(self.embed_dim, name="linear2")(f)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + f)


class HubertSoft(nn.Module):
    """HuBERT-soft: wave (B, T) -> soft units (B, T//320, unit_dim)."""

    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    extractor_channels: int = 512
    unit_dim: int = 256
    pos_kernel_size: int = 128
    pos_groups: int = 16

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        x = FeatureExtractor(self.extractor_channels, name="feature_extractor")(wav[..., None])
        x = FeatureProjection(self.embed_dim, name="feature_projection")(x)
        x = x + PositionalConvEmbedding(self.embed_dim, self.pos_kernel_size,
                                        self.pos_groups, name="positional_embedding")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        for i in range(self.num_layers):
            x = TransformerLayer(self.embed_dim, self.num_heads, self.ffn_dim,
                                 name=f"layer_{i}")(x)
        return Dense(self.unit_dim, name="proj")(x)

    def units(self, wav: jax.Array) -> jax.Array:
        """Reference ``HubertSoft.units``: pad (400-320)//2 both sides first."""
        pad = (400 - 320) // 2
        wav = jnp.pad(wav, [(0, 0), (pad, pad)])
        return self(wav)
