"""Pallas TPU kernel: fused k=5/stride-1 conv + bias + LeakyReLU, custom VJP.

The VERDICT-r2 item 5a experiment: attack the discriminator backward (the
train step's largest block, BENCH.md "discriminator param-grad 36.0 ms")
from the Pallas side. Target: DiscriminatorP's 5th conv (1024->1024, (5,1)
kernel, stride 1 — reference models.py:436), the single heaviest layer
(~58% of a period-disc's FLOPs). The conv is expressed as 5 accumulated
row-shifted matmuls (the fused_istft.py restructuring) with the bias +
LeakyReLU epilogue fused; the backward reuses the same kernel shape:

  fwd :  y[r]        = lrelu( sum_dr x[r+dr] @ K[dr] + b )
  dx  :  dx[m]       = sum_dr dym[m+2-dr] @ K[dr]^T      (flipped conv)
  dW  :  dW[dr]      = sum_{n} x_n[dr:dr+R]^T @ dym_n
  db  :  sum(dym);   dym = dy * lrelu'(y)   (mask from the saved OUTPUT —
                                             lrelu is sign-preserving)

Layouts: x (N, R, C) with channels on lanes; the dr row shifts are sublane
rolls (pltpu.roll) so no unaligned VMEM slicing is needed. Equivalence is
tested in tests/test_pallas.py (interpret mode); the TPU A/B lives in
scripts/disc_pallas_ab.py — see BENCH.md for the verdict.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K5 = 5
PAD = K5 - 1  # 2 halo rows each side


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _fwd_kernel(x_ref, k_ref, b_ref, out_ref, *, rows, slope):
    """One (n, c_out tile) program: 5 shifted matmuls + bias + LReLU."""
    x = x_ref[0]  # (rows_pad + PAD, C_in)
    # Mosaic's sublane rotate is 32-bit only ("Rotate with non-32-bit data"
    # on real TPU; interpret mode accepts bf16) — roll an f32 view and
    # downcast at the matmul input, which is lossless for bf16.
    # VMEM note (ADVICE r3): this f32 view doubles the halo'd block's VMEM
    # footprint in the fwd and dW kernels. Irrelevant while the op stays
    # off the training path (it LOST the A/B, BENCH.md "disc backward");
    # if ever enabled at larger rows/channel tiles, re-budget tile sizes
    # for the extra copy or restrict the upcast to bf16 inputs.
    x32 = x.astype(jnp.float32)
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)  # (rows_pad, c_out_t)
    for dr in range(K5):
        # rows dr .. dr+rows_pad-1: roll the halo'd buffer up by dr, then
        # take the aligned [0, rows_pad) window.
        xs = pltpu.roll(x32, shift=x.shape[0] - dr, axis=0)[
            : out_ref.shape[1]].astype(x.dtype)
        # f32 inputs keep true-f32 multiplicands (Mosaic's default f32 dot
        # rounds to bf16 — round-5 on-TPU parity gate); no-op for bf16
        acc += jax.lax.dot_general(
            xs, k_ref[dr], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST
                       if x.dtype == jnp.float32 else None))
    acc += b_ref[0].astype(jnp.float32)
    out_ref[0] = jnp.where(acc > 0, acc, slope * acc).astype(out_ref.dtype)


def _dw_kernel(x_ref, dym_ref, dw_ref, *, rows):
    """dW[dr] for one (c_in tile, c_out tile), accumulated over n (last grid dim)."""
    n = pl.program_id(2)
    x = x_ref[0]        # (rows_pad + PAD, c_in_t)
    x32 = x.astype(jnp.float32)  # 32-bit-only sublane rotate, see _fwd_kernel
    dym = dym_ref[0]    # (rows_pad, c_out_t)

    @pl.when(n == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for dr in range(K5):
        xs = pltpu.roll(x32, shift=x.shape[0] - dr, axis=0)[
            : dym.shape[0]].astype(x.dtype)
        # (c_in_t, c_out_t) = xs^T @ dym, contracting rows
        dw_ref[dr] += jax.lax.dot_general(
            xs, dym, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST
                       if x.dtype == jnp.float32 else None)
        ).astype(dw_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv5_lrelu(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                slope: float = 0.1) -> jax.Array:
    """lrelu(conv1d(x, kernel, 'SAME', stride 1) + bias).

    x (N, R, C_in), kernel (5, C_in, C_out), bias (C_out) -> (N, R, C_out).
    """
    return _conv5_fwd_impl(x, kernel, bias, slope)


def _pick_tile(c: int, budget: int = 512) -> int:
    t = min(c, budget)
    while c % t:
        t //= 2
    return max(t, 128) if c % 128 == 0 else c


def _conv5_fwd_impl(x, kernel, bias, slope):
    n, rows, c_in = x.shape
    c_out = kernel.shape[2]
    rows_pad = _round_up(rows, 16)
    # halo'd, padded input: rows -2..rows_pad+1 (zeros outside [0, rows))
    xh = jnp.pad(x, ((0, 0), (PAD // 2, rows_pad - rows + PAD // 2), (0, 0)))
    c_out_t = _pick_tile(c_out)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rows=rows, slope=slope),
        grid=(c_out // c_out_t, n),
        in_specs=[
            pl.BlockSpec((1, rows_pad + PAD, c_in), lambda o, i: (i, 0, 0)),
            pl.BlockSpec((K5, c_in, c_out_t), lambda o, i: (0, 0, o)),
            pl.BlockSpec((1, c_out_t), lambda o, i: (0, o)),
        ],
        out_specs=pl.BlockSpec((1, rows_pad, c_out_t), lambda o, i: (i, 0, o)),
        out_shape=jax.ShapeDtypeStruct((n, rows_pad, c_out), x.dtype),
    )(xh, kernel, bias[None])
    return out[:, :rows]


def _conv5_vjp_fwd(x, kernel, bias, slope):
    y = _conv5_fwd_impl(x, kernel, bias, slope)
    return y, (x, kernel, y)


def _conv5_vjp_bwd(slope, res, dy):
    x, kernel, y = res
    n, rows, c_in = x.shape
    c_out = kernel.shape[2]
    # LReLU derivative from the saved OUTPUT sign (monotone activation).
    dym = (dy * jnp.where(y > 0, 1.0, slope).astype(dy.dtype))
    db = jnp.sum(dym.astype(jnp.float32), axis=(0, 1)).astype(kernel.dtype)

    # dx: flipped-kernel conv of dym — reuse the forward kernel with
    # K'[dr] = K[4-dr]^T (tiny transpose, prepared by XLA).
    k_flip = jnp.flip(kernel, axis=0).transpose(0, 2, 1)  # (5, C_out, C_in)
    dx = _conv5_fwd_impl(dym, k_flip, jnp.zeros((c_in,), dym.dtype), 1.0)
    # slope=1 disables the activation; 'where' with slope 1 is identity.

    # dW: accumulate over n on the last grid dim.
    rows_pad = _round_up(rows, 16)
    xh = jnp.pad(x, ((0, 0), (PAD // 2, rows_pad - rows + PAD // 2), (0, 0)))
    dymp = jnp.pad(dym, ((0, 0), (0, rows_pad - rows), (0, 0)))
    c_in_t = _pick_tile(c_in)
    c_out_t = _pick_tile(c_out)
    dw = pl.pallas_call(
        functools.partial(_dw_kernel, rows=rows),
        grid=(c_in // c_in_t, c_out // c_out_t, n),
        in_specs=[
            pl.BlockSpec((1, rows_pad + PAD, c_in_t), lambda i, o, b: (b, 0, i)),
            pl.BlockSpec((1, rows_pad, c_out_t), lambda i, o, b: (b, 0, o)),
        ],
        out_specs=pl.BlockSpec((K5, c_in_t, c_out_t), lambda i, o, b: (0, i, o)),
        out_shape=jax.ShapeDtypeStruct((K5, c_in, c_out), jnp.float32),
    )(xh, dymp)
    return dx, dw.astype(kernel.dtype), db


conv5_lrelu.defvjp(_conv5_vjp_fwd, _conv5_vjp_bwd)


def conv5_lrelu_reference(x, kernel, bias, slope=0.1):
    """XLA reference implementation (same math, for tests/A-B)."""
    y = jax.lax.conv_general_dilated(
        x, kernel, (1,), [(PAD // 2, PAD // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    y = y + bias.astype(y.dtype)
    return jnp.where(y > 0, y, (slope * y).astype(y.dtype))
