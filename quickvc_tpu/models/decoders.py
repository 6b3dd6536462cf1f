"""Decoder family: latent z -> waveform via sub-band iSTFT heads.

Parity targets (reference models.py:98-415), all channels-last ``(B, T, C)``:

- ``ISTFTGenerator``           == iSTFT_Generator           (models.py:98-192)
- ``MultibandISTFTGenerator``  == Multiband_iSTFT_Generator (models.py:195-301)
- ``MultistreamISTFTGenerator`` == Multistream_iSTFT_Generator (models.py:304-415),
  the default (``ms_istft_vits: true``).

Shared structure: conv_pre(k=7) + SegFC speaker conditioning, 2 upsample
stages (ConvTranspose k=16, rates [5,4] with the reference's exact
padding/output_padding arithmetic, models.py:334-335), MRF ResBlock stacks,
left reflection pad + conv_post to ``subbands * 2 * (n_fft/2+1)`` channels,
then ``exp(mag) * exp(i*pi*sin(phase))`` -> inverse STFT (n_fft=16, hop=4).

TPU-first: the iSTFT head is matmul-based (see dsp/istft.py); band batching
folds the 4 sub-bands into the batch dim; the learned multistream synthesis
filter is a single input-dilated conv.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from quickvc_tpu.dsp.istft import polar_inverse_stft
from quickvc_tpu.dsp.pqmf import PQMFBank
from quickvc_tpu.models.layers import (
    Conv1d,
    ConvTranspose1d,
    WNConv1d,
    leaky_relu,
    normal_init,
    reflection_pad_left,
)
from quickvc_tpu.models.modules import ResBlock1


class _UpMRFBackbone(nn.Module):
    """conv_pre + cond + upsample/MRF trunk shared by all decoder variants."""

    initial_channel: int
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gin_channels: int
    istft_style_padding: bool = False  # True only for the single-band iSTFT decoder

    @nn.compact
    def __call__(self, x: jax.Array, g: jax.Array) -> jax.Array:
        num_kernels = len(self.resblock_kernel_sizes)
        x = WNConv1d(self.upsample_initial_channel, 7, name="conv_pre")(x) \
            + Conv1d(self.upsample_initial_channel, 1, name="cond")(g)
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x)
            if self.istft_style_padding:
                # iSTFT_Generator: padding=(k-u)//2, no output_padding (models.py:127-128)
                pad, outpad = (k - u) // 2, 0
            else:
                # MB/MS generators: padding=(k-u+1-i)//2, output_padding=1-i (models.py:334-335)
                pad, outpad = (k - u + 1 - i) // 2, 1 - i
            x = ConvTranspose1d(ch, k, u, padding=pad, output_padding=outpad,
                                kernel_init=normal_init(), name=f"up_{i}")(x)
            xs = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)):
                r = ResBlock1(ch, rk, tuple(rd), name=f"resblock_{i}_{j}")(x)
                xs = r if xs is None else xs + r
            x = xs / num_kernels
        return leaky_relu(x, 0.01)  # final LReLU uses torch default slope (models.py:271,385: F.leaky_relu(x))


class ISTFTGenerator(nn.Module):
    """Single-band iSTFT decoder. (B, F, C_latent) x (B, 1|F, gin) -> (B, T, 1)."""

    initial_channel: int
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gen_istft_n_fft: int = 16
    gen_istft_hop_size: int = 4
    subbands: int = 1
    gin_channels: int = 256
    use_pallas_istft: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, g: jax.Array):
        n_freq = self.gen_istft_n_fft // 2 + 1
        x = _UpMRFBackbone(self.initial_channel, self.resblock_kernel_sizes,
                           self.resblock_dilation_sizes, self.upsample_rates,
                           self.upsample_initial_channel, self.upsample_kernel_sizes,
                           self.gin_channels, istft_style_padding=True, name="backbone")(x, g)
        x = reflection_pad_left(x)
        x = WNConv1d(2 * n_freq, 7, kernel_init=normal_init(), name="conv_post")(x)
        log_mag, phase = x[..., :n_freq], x[..., n_freq:]
        wave = _polar_istft(log_mag, phase, self.gen_istft_n_fft,
                            self.gen_istft_hop_size, self.use_pallas_istft)
        return wave[..., None], None


def _polar_istft(log_mag, phase, n_fft, hop, use_pallas: bool):
    if use_pallas:
        from quickvc_tpu.ops.fused_istft import polar_inverse_stft_pallas
        return polar_inverse_stft_pallas(log_mag, phase, n_fft, hop)
    return polar_inverse_stft(log_mag, phase, n_fft, hop)


class _SubbandHead(nn.Module):
    """Shared MB/MS head: conv_post -> per-band polar iSTFT -> (B, Band, T')."""

    subbands: int
    n_fft: int
    hop: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = self.subbands
        n_freq = self.n_fft // 2 + 1
        x = reflection_pad_left(x)
        x = WNConv1d(s * 2 * n_freq, 7, kernel_init=normal_init(), name="subband_conv_post")(x)
        b, f = x.shape[0], x.shape[1]
        # channel order from torch reshape (B, s*2freq, T)->(B, s, 2freq, T):
        # band-major. Channels-last equivalent: (B, T, s, 2freq).
        x = x.reshape(b, f, s, 2 * n_freq)
        log_mag, phase = x[..., :n_freq], x[..., n_freq:]
        # Band batching: (B, T, s, freq) -> (B*s, T, freq)
        log_mag = log_mag.transpose(0, 2, 1, 3).reshape(b * s, f, n_freq)
        phase = phase.transpose(0, 2, 1, 3).reshape(b * s, f, n_freq)
        wave = _polar_istft(log_mag, phase, self.n_fft, self.hop, self.use_pallas)
        return wave.reshape(b, s, -1)


class MultibandISTFTGenerator(nn.Module):
    """4-band decoder with fixed PQMF synthesis filterbank.

    Returns (wave (B, T, 1), subband waves (B, T', Band)).
    """

    initial_channel: int
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gen_istft_n_fft: int = 16
    gen_istft_hop_size: int = 4
    subbands: int = 4
    gin_channels: int = 256
    use_pallas_istft: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, g: jax.Array):
        x = _UpMRFBackbone(self.initial_channel, self.resblock_kernel_sizes,
                           self.resblock_dilation_sizes, self.upsample_rates,
                           self.upsample_initial_channel, self.upsample_kernel_sizes,
                           self.gin_channels, name="backbone")(x, g)
        y_mb = _SubbandHead(self.subbands, self.gen_istft_n_fft, self.gen_istft_hop_size,
                            self.use_pallas_istft, name="head")(x)  # (B, Band, T')
        y_mb_tl = y_mb.transpose(0, 2, 1)                        # (B, T', Band)
        pqmf = PQMFBank(self.subbands)
        y = pqmf.synthesis(y_mb_tl)                              # (B, T, 1)
        return y, y_mb_tl


class MultistreamISTFTGenerator(nn.Module):
    """4-stream decoder with a *learned* synthesis filter (the default).

    Band combination = zero-stuffing upsample x subbands (identity updown
    filter scaled by subbands, models.py:353-358,405) followed by a learned
    63-tap Conv1d(4 -> 1, no bias) — fused here into one input-dilated conv.

    Returns (wave (B, T, 1), upsampled streams (B, T, Band)) — the second
    output mirrors the reference's post-conv_transpose ``y_mb_hat``
    (models.py:405,408).
    """

    initial_channel: int
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gen_istft_n_fft: int = 16
    gen_istft_hop_size: int = 4
    subbands: int = 4
    gin_channels: int = 256
    use_pallas_istft: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, g: jax.Array):
        s = self.subbands
        x = _UpMRFBackbone(self.initial_channel, self.resblock_kernel_sizes,
                           self.resblock_dilation_sizes, self.upsample_rates,
                           self.upsample_initial_channel, self.upsample_kernel_sizes,
                           self.gin_channels, name="backbone")(x, g)
        y_mb = _SubbandHead(s, self.gen_istft_n_fft, self.gen_istft_hop_size,
                            self.use_pallas_istft, name="head")(x)  # (B, Band, T')
        y_mb_tl = y_mb.transpose(0, 2, 1)                        # (B, T', Band)

        # Zero-stuffing upsample x s (scaled by s): (B, T', s) -> (B, s*T', s)
        tprime = y_mb_tl.shape[1]
        up = jnp.zeros((y_mb_tl.shape[0], tprime, s, s), y_mb_tl.dtype)
        up = up.at[:, :, 0, :].set(y_mb_tl * s)
        up = up.reshape(y_mb_tl.shape[0], s * tprime, s)

        y = WNConv1d(1, 63, padding=31, use_bias=False,
                     kernel_init=normal_init(), name="multistream_conv_post")(up)
        return y, up


def build_decoder(model_cfg) -> nn.Module:
    """Decoder dispatch (reference models.py:588-591)."""
    kind = model_cfg.decoder_kind
    cls = {"mb_istft": MultibandISTFTGenerator,
           "ms_istft": MultistreamISTFTGenerator,
           "istft": ISTFTGenerator}[kind]
    return cls(
        initial_channel=model_cfg.inter_channels,
        resblock_kernel_sizes=model_cfg.resblock_kernel_sizes,
        resblock_dilation_sizes=model_cfg.resblock_dilation_sizes,
        upsample_rates=model_cfg.upsample_rates,
        upsample_initial_channel=model_cfg.upsample_initial_channel,
        upsample_kernel_sizes=model_cfg.upsample_kernel_sizes,
        gen_istft_n_fft=model_cfg.gen_istft_n_fft,
        gen_istft_hop_size=model_cfg.gen_istft_hop_size,
        subbands=model_cfg.subbands,
        gin_channels=model_cfg.gin_channels,
        use_pallas_istft=getattr(model_cfg, "use_pallas_istft", False),
        name="dec",
    )
