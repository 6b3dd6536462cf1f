"""Pallas fused multi-head attention for the HuBERT content encoder.

Why: HuBERT's 12 transformer layers at batch 32 x ~500 frames spend their
time writing the (B, heads, T, T) score matrices to HBM — XLA materializes
the softmax input/output between the two matmuls, ~44 GB of traffic per
forward (86% of v5e HBM peak; scripts/roofline.py + /tmp breakdown). At
these lengths one head's entire attention fits in VMEM, so this kernel
computes softmax(QK^T * scale) V per (batch, head) grid step with the
scores living only in registers/VMEM — no flash-attention streaming needed,
just fusion.

Exactness: this is plain attention evaluated in one block (not an online-
softmax approximation) with f32 score accumulation — bit-comparable to the
XLA path up to reduction order.

Reference context: the torch model runs standard nn.MultiheadAttention
(bshall/hubert); the reference repo calls it via torch.hub
(reference convert.py:44, dataset/encode.py:16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _prec(dtype):
    """f32 inputs keep true-f32 MXU multiplicands; Mosaic's DEFAULT f32 dot
    rounds them to bf16 (~1e-3 relative error, found by the round-5 on-TPU
    parity gate — interpret mode is exact f32 and hid it). bf16 inputs stay
    single-pass: there is nothing left to round."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, true_len: int):
    """One (batch, head) step: (Tp, D) q/k/v blocks; scores stay in VMEM."""
    q = q_ref[0]                                   # (Tp, D)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(q.dtype)) * scale                    # (Tp, Tp) f32
    tp = s.shape[-1]
    if true_len < tp:  # mask padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
        s = jnp.where(col < true_len, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32,
                precision=_prec(v.dtype))
    o_ref[0] = o.astype(o_ref.dtype)


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                   true_len: int, num_heads: int, head_dim: int):
    """One batch item: q/k/v blocks (Tp, H*D) packed head-major; the head
    loop is unrolled statically so scores never leave VMEM and the output
    is written back in packed layout (no transposes anywhere)."""
    tp = q_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    # Stage-grouped emission: all score matmuls, then all softmaxes, then
    # all V matmuls. Per-head chains are serial (matmul -> softmax ->
    # matmul); grouping gives the in-order VLIW scheduler independent work
    # from other heads to overlap MXU and VPU.
    sls = [slice(h * head_dim, (h + 1) * head_dim) for h in range(num_heads)]
    ss = []
    for sl in sls:
        s = jax.lax.dot_general(
            q_ref[0][:, sl], k_ref[0][:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(q_ref.dtype)) * scale
        if true_len < tp:
            s = jnp.where(col < true_len, s, -jnp.inf)
        ss.append(s)
    ps = [jax.nn.softmax(s, axis=-1) for s in ss]
    for sl, p in zip(sls, ps):
        o = jnp.dot(p.astype(v_ref.dtype), v_ref[0][:, sl],
                    preferred_element_type=jnp.float32,
                    precision=_prec(v_ref.dtype))
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def fused_attention_packed(q: jax.Array, k: jax.Array, v: jax.Array,
                           num_heads: int, scale: float) -> jax.Array:
    """Packed-layout fused MHA: q/k/v are (B, T, H*D) straight out of the
    input projection — no head transpose, no head-split copies. Returns
    (B, T, H*D), ready for the output projection.

    T pads up to a multiple of 128 (padded keys masked in-kernel, padded
    query rows cropped on exit). Falls back to einsum attention off-TPU.
    """
    b, t, hd_all = q.shape
    d = hd_all // num_heads
    if jax.default_backend() != "tpu":
        def heads(z):
            return z.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)

        o = fused_attention(heads(q), heads(k), heads(v), scale)
        return o.transpose(0, 2, 1, 3).reshape(b, t, hd_all)

    tp = -(-t // 128) * 128
    if tp != t:
        pad = [(0, 0), (0, tp - t), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    kern = functools.partial(_packed_kernel, scale=scale, true_len=t,
                             num_heads=num_heads, head_dim=d)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, tp, hd_all), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, tp, hd_all), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, hd_all), q.dtype),
        # f32 inputs at T=512 need ~17 MB of scoped VMEM (4 double-buffered
        # (Tp, H*D) blocks + the f32 score tile); the 16 MB default is only
        # a compiler cap — v5e has far more physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # batch grid steps are independent -> pipeline DMAs across them
            dimension_semantics=("parallel",),
            # input fusion only for bf16: a fused f32 pad producer builds
            # its (1, Tp, H*D) operand on the XLA fusion's OWN 16 MB scoped
            # stack (not governed by vmem_limit_bytes above) and trips it
            # at T=512 f32 — found by the round-5 on-TPU parity gate
            allow_input_fusion=[q.dtype != jnp.float32] * 3),
    )(q, k, v)
    return out[:, :t]


def _packed_kernel_aligned(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                           true_len: int, num_heads: int, head_pad: int):
    """Like ``_packed_kernel`` but heads are pre-padded to ``head_pad``
    (=128) lanes, so every per-head slice is lane-aligned — no Mosaic
    relayout on the MXU operands. Padded q/k lanes are zero, so scores are
    unchanged; padded v lanes are zero, so padded output lanes are zero."""
    tp = q_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    sls = [slice(h * head_pad, (h + 1) * head_pad) for h in range(num_heads)]
    ss = []
    for sl in sls:
        s = jax.lax.dot_general(
            q_ref[0][:, sl], k_ref[0][:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(q_ref.dtype)) * scale
        if true_len < tp:
            s = jnp.where(col < true_len, s, -jnp.inf)
        ss.append(s)
    ps = [jax.nn.softmax(s, axis=-1) for s in ss]
    for sl, p in zip(sls, ps):
        o = jnp.dot(p.astype(v_ref.dtype), v_ref[0][:, sl],
                    preferred_element_type=jnp.float32,
                    precision=_prec(v_ref.dtype))
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def fused_attention_packed_aligned(q: jax.Array, k: jax.Array, v: jax.Array,
                                   num_heads: int, scale: float,
                                   head_pad: int = 128) -> jax.Array:
    """Packed fused MHA over lane-ALIGNED padded heads.

    q/k/v are (B, T, H*head_pad) with each head's true ``d`` values in the
    first lanes of its 128-lane slot and zeros elsewhere (produce this for
    free by zero-padding the qkv projection *weights* — see
    models/hubert.py). Returns (B, T, H*head_pad) with padded lanes zero,
    which the output projection consumes directly (its padded input rows
    are zero weights). Compared to ``fused_attention_packed`` this spends
    ~2x the projection FLOPs to make every in-kernel slice 128-aligned.
    """
    b, t, hp_all = q.shape
    if jax.default_backend() != "tpu":
        d = hp_all // num_heads

        def heads(z):
            return z.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)

        o = fused_attention(heads(q), heads(k), heads(v), scale)
        return o.transpose(0, 2, 1, 3).reshape(b, t, hp_all)

    tp = -(-t // 128) * 128
    if tp != t:
        pad = [(0, 0), (0, tp - t), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    kern = functools.partial(_packed_kernel_aligned, scale=scale, true_len=t,
                             num_heads=num_heads, head_pad=head_pad)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, tp, hp_all), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, tp, hp_all), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, hp_all), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
            allow_input_fusion=[True, True, True]),
    )(q, k, v)
    return out[:, :t]


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float) -> jax.Array:
    """softmax(q k^T * scale) v over (B, H, T, D) inputs.

    T is padded up to a multiple of 128 on entry (padded key columns are
    masked to -inf inside the kernel; padded query rows are cropped on
    exit), so XLA compiles one program per 128-frame length bucket.
    Falls back to the einsum path off-TPU.
    """
    b, h, t, d = q.shape
    if jax.default_backend() != "tpu":
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    tp = -(-t // 128) * 128
    if tp != t:
        pad = [(0, 0), (0, 0), (0, tp - t), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    kern = functools.partial(_attn_kernel, scale=scale, true_len=t)
    out = pl.pallas_call(
        kern,
        grid=(b * h,),
        in_specs=[pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, d), q.dtype),
    )(q.reshape(b * h, tp, d), k.reshape(b * h, tp, d),
      v.reshape(b * h, tp, d)).reshape(b, h, tp, d)
    return out[:, :, :t]
