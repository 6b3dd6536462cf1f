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


def norm_like(norm: nn.Module, x: jax.Array) -> jax.Array:
    """Apply a flax norm layer, returning the INPUT's dtype.

    flax norm layers promote bf16 inputs to f32 (f32 params), which silently
    upcasts everything downstream of the first GroupNorm — the whole
    transformer would run f32 under a "bf16" policy (2x HBM traffic, 2x VPU
    time, measured at +30% whole-model time). Stats still reduce in f32
    inside flax; only the normalized output is cast back.
    """
    return norm(x).astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Precision-adaptive GELU.

    f32: exact erf GELU (bit-parity with the torch reference, which uses
    ``nn.GELU()`` == erf). bf16: tanh approximation — the erf polynomial is
    ~3.2x more VPU time (9.3 vs 2.9 ms on the batch-32 extractor tensor,
    scripts/hubert_breakdown.py) while its deviation from exact GELU
    (max 4.8e-4 absolute, 1.8e-4 relative at the worst point x~2.7) sits at
    the bf16 quantization floor (eps = 2^-8 ~ 3.9e-3), so in bf16 the two
    are indistinguishable downstream. GELU runs on every extractor layer and
    every FFN, so this is ~25% of the HuBERT forward.
    """
    return jax.nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


class FeatureExtractor(nn.Module):
    """Waveform (B, T, 1) -> features (B, T/320, channels).

    ``front_mode`` picks how the first two stages (conv0 + GroupNorm + GELU
    + conv1 + GELU) run — identical parameters and numerics at the compute
    dtype in all modes (TPU timings: BENCH.md):

    - ``"xla"``   (default): plain flax chain; GroupNorm reduces over the
      ~1 GB conv0 output. 9.0 ms at batch 32 x 10 s bf16.
    - ``"faststats"`` (serving): GroupNorm's per-channel affine computed in
      the WAVE domain in closed form (ops/fused_extractor.py:
      groupnorm_affine_closed_form), so XLA fuses normalize+GELU into
      conv0's epilogue — two full HBM passes gone. 7.7 ms. Works on any
      backend.
    - ``"pallas"``: one fused kernel for the whole front
      (ops/fused_extractor.py). Kept as a documented Mosaic pattern; it
      LOSES to XLA here (12.5 ms — the serial matmul->norm->GELU chain
      doesn't overlap MXU/VPU), so it is not the serving default. TPU only.
    """

    channels: int = 512
    front_mode: str = "xla"

    def setup(self):
        c = self.channels
        self.conv0 = Conv1d(c, 10, stride=5, padding="valid", use_bias=False)
        # GroupNorm(512, 512) == per-channel instance norm over time
        self.norm0 = nn.GroupNorm(num_groups=c, epsilon=1e-5)
        for i in range(1, 5):
            setattr(self, f"conv{i}",
                    Conv1d(c, 3, stride=2, padding="valid", use_bias=False))
        for i in range(5, 7):
            setattr(self, f"conv{i}",
                    Conv1d(c, 2, stride=2, padding="valid", use_bias=False))

    def __call__(self, x: jax.Array) -> jax.Array:
        mode = self.front_mode if not self.is_initializing() else "xla"
        if mode == "pallas" and jax.default_backend() != "tpu":
            mode = "xla"
        if mode == "pallas":
            from quickvc_tpu.ops.fused_extractor import fused_extractor_front

            p = self.variables["params"]
            x = fused_extractor_front(
                x[..., 0], p["conv0"]["kernel"], p["norm0"]["scale"],
                p["norm0"]["bias"], p["conv1"]["kernel"])
        elif mode == "faststats":
            from quickvc_tpu.ops.fused_extractor import (
                groupnorm_affine_closed_form)

            p = self.variables["params"]
            scale, shift = groupnorm_affine_closed_form(
                x[..., 0], p["conv0"]["kernel"], p["norm0"]["scale"],
                p["norm0"]["bias"])
            y = self.conv0(x)
            yn = (y * scale[:, None, :].astype(y.dtype)
                  + shift[:, None, :].astype(y.dtype))
            x = gelu(self.conv1(gelu(yn)))
        else:
            x = gelu(norm_like(self.norm0, self.conv0(x)))
            x = gelu(self.conv1(x))
        for i in range(2, 7):
            x = gelu(getattr(self, f"conv{i}")(x))
        return x


class FeatureProjection(nn.Module):
    embed_dim: int = 768

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = norm_like(nn.LayerNorm(epsilon=1e-5, name="norm"), x)
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
        return gelu(y)


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
    """Post-norm transformer encoder layer (torch TransformerEncoderLayer default).

    ``use_pallas_layer=True`` (TPU only) runs the whole layer as one fused
    Pallas kernel (ops/fused_transformer.py) — same parameters, same
    numerics at the compute dtype; qkv/attention/FFN intermediates never
    touch HBM. Kept as a documented Mosaic pattern: measured SLOWER than
    the XLA layer (3.5 vs 3.2 ms isolated at batch 32 x 500 frames bf16 —
    the in-kernel chain is serial, and XLA's per-op pipeline with the
    fused-attention kernel already overlaps well), so off by default.
    """

    embed_dim: int = 768
    num_heads: int = 12
    ffn_dim: int = 3072
    use_pallas_layer: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if (self.use_pallas_layer and not self.is_initializing()
                and jax.default_backend() == "tpu"):
            from quickvc_tpu.ops.fused_transformer import fused_transformer_layer

            return fused_transformer_layer(x, self.variables["params"],
                                           self.num_heads)
        a = MultiHeadAttention(self.embed_dim, self.num_heads, name="self_attn")(x)
        x = norm_like(nn.LayerNorm(epsilon=1e-5, name="norm1"), x + a)
        f = Dense(self.ffn_dim, name="linear1")(x)
        f = gelu(f)
        f = Dense(self.embed_dim, name="linear2")(f)
        return norm_like(nn.LayerNorm(epsilon=1e-5, name="norm2"), x + f)


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
    front_mode: str = "xla"          # see FeatureExtractor.front_mode
    use_pallas_layer: bool = False   # see TransformerLayer.use_pallas_layer

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        x = FeatureExtractor(self.extractor_channels, self.front_mode,
                             name="feature_extractor")(wav[..., None])
        x = FeatureProjection(self.embed_dim, name="feature_projection")(x)
        x = x + PositionalConvEmbedding(self.embed_dim, self.pos_kernel_size,
                                        self.pos_groups, name="positional_embedding")(x)
        x = norm_like(nn.LayerNorm(epsilon=1e-5, name="norm"), x)
        for i in range(self.num_layers):
            x = TransformerLayer(self.embed_dim, self.num_heads, self.ffn_dim,
                                 self.use_pallas_layer, name=f"layer_{i}")(x)
        return Dense(self.unit_dim, name="proj")(x)

    def units(self, wav: jax.Array) -> jax.Array:
        """Reference ``HubertSoft.units``: pad (400-320)//2 both sides first."""
        pad = (400 - 320) // 2
        wav = jnp.pad(wav, [(0, 0), (pad, pad)])
        return self(wav)
