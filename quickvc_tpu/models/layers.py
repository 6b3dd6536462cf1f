"""Primitive conv layers (channels-last, torch-semantics-compatible).

These wrap ``lax.conv_general_dilated`` with the exact padding / weight-norm /
transpose conventions of the torch layers the reference builds on, so that
(a) numerics match for golden tests and (b) pretrained torch checkpoints can
be ported weight-for-weight (see ``quickvc_tpu/utils/torch_port.py``).

Kernel storage layout is lax 'HIO': ``(k, in, out)``; a torch ``Conv1d``
weight ``(out, in, k)`` maps via ``transpose(2, 1, 0)``.

Weight norm follows torch ``nn.utils.weight_norm`` with ``dim=0``:
- Conv1d: per-*output*-channel scale ``g``; norm over (k, in).
- ConvTranspose1d (torch weight ``(in, out, k)``): per-*input*-channel scale.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


def leaky_relu(x: jax.Array, slope: float = LRELU_SLOPE) -> jax.Array:
    return jnp.where(x >= 0, x, x * slope)


def _torch_conv_init(k: int, in_ch: int, groups: int = 1):
    """torch Conv default init: kaiming-uniform(a=sqrt(5)) == U(-b, b), b=1/sqrt(fan_in)."""
    fan_in = k * in_ch // groups

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_init(std: float = 0.01):
    """Reference decoder conv init (commons.init_weights: normal(0, 0.01))."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std
    return init


class Conv1d(nn.Module):
    """Plain 1-D conv, channels-last (B, T, Cin) -> (B, T', Cout)."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: str | int = "same"   # "same" | "valid" | explicit symmetric pad
    use_bias: bool = True
    kernel_init: Callable | None = None
    bias_init: Callable | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        init = self.kernel_init or _torch_conv_init(k, in_ch, self.groups)
        kernel = self.param("kernel", init, (k, in_ch // self.groups, self.features))
        if self.padding == "same":
            eff = (k - 1) * self.dilation
            pad = [(eff // 2, eff - eff // 2)]
        elif self.padding == "valid":
            pad = [(0, 0)]
        else:
            pad = [(int(self.padding), int(self.padding))]
        x = x.astype(self.dtype or x.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=(self.stride,),
            padding=pad,
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            binit = self.bias_init or _torch_conv_init(k, in_ch, self.groups)
            bias = self.param("bias", binit, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class WNConv1d(nn.Module):
    """Weight-normalized 1-D conv (torch weight_norm dim=0 semantics)."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: str | int = "same"
    use_bias: bool = True
    kernel_init: Callable | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        init = self.kernel_init or _torch_conv_init(k, in_ch, self.groups)
        v = self.param("v", init, (k, in_ch // self.groups, self.features))
        # torch init: g = ||v|| per output channel at wrap time. We initialize g
        # from an independent draw with the same distribution statistics; exact
        # ||v|| coupling is restored on checkpoint port.
        g = self.param("g", lambda key, shape: jnp.linalg.norm(
            init(key, (k, in_ch // self.groups, self.features)).reshape(-1, self.features), axis=0),
            (self.features,))
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
        kernel = (g[None, None, :] / norm) * v
        if self.padding == "same":
            eff = (k - 1) * self.dilation
            pad = [(eff // 2, eff - eff // 2)]
        elif self.padding == "valid":
            pad = [(0, 0)]
        else:
            pad = [(int(self.padding), int(self.padding))]
        x = x.astype(self.dtype or x.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=(self.stride,),
            padding=pad,
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", _torch_conv_init(k, in_ch, self.groups), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class ConvTranspose1d(nn.Module):
    """Transposed 1-D conv matching torch ``ConvTranspose1d`` semantics.

    out_len = (in_len - 1) * stride - 2 * padding + kernel_size + output_padding.
    Implemented as an input-dilated conv with a time-flipped kernel (XLA's
    native formulation; maps onto the MXU).

    Weight norm (``weight_normed=True``) follows torch dim=0 on the torch
    weight layout ``(in, out, k)``: one scale per *input* channel, norm over
    (out, k). Param ``v`` is stored as ``(k, out, in)`` ('HIO' for the
    underlying forward conv after flip) — torch weight maps via
    ``transpose(2, 1, 0)``.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    output_padding: int = 0
    weight_normed: bool = True
    use_bias: bool = True
    kernel_init: Callable | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        init = self.kernel_init or _torch_conv_init(k, self.features)  # torch fan_in for transpose = out*k... keep simple
        v = self.param("v", init, (k, self.features, in_ch))
        if self.weight_normed:
            g = self.param("g", lambda key, shape: jnp.linalg.norm(
                init(key, (k, self.features, in_ch)).reshape(-1, in_ch), axis=0), (in_ch,))
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
            kernel = (g[None, None, :] / norm) * v
        else:
            kernel = v
        # time-flip; 'HIO' expects (k, in, out): our stored (k, out, in) -> swap
        kernel = jnp.flip(kernel, axis=0).transpose(0, 2, 1)
        lo = k - 1 - self.padding
        hi = k - 1 - self.padding + self.output_padding
        x = x.astype(self.dtype or x.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=(1,),
            padding=[(lo, hi)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            bias = self.param("bias", _torch_conv_init(k, in_ch), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class Dense(nn.Module):
    """Linear layer with torch nn.Linear default init."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        init = _torch_conv_init(1, in_ch)
        w = self.param("kernel", init, (in_ch, self.features))
        y = x @ w.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", init, (self.features,))
            y = y + b.astype(y.dtype)
        return y


def reflection_pad_left(x: jax.Array) -> jax.Array:
    """torch ReflectionPad1d((1, 0)) on the time axis of (B, T, C)."""
    return jnp.pad(x, [(0, 0), (1, 0), (0, 0)], mode="reflect")
