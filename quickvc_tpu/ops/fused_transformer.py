"""Pallas TPU kernel: one fully-fused HuBERT transformer encoder layer.

One grid step = one batch item; the WHOLE post-norm layer runs in a single
kernel with every weight matrix resident in VMEM across grid steps
(constant-index blocks are DMA'd once, not per step):

    qkv = x @ Win^T + bin
    per head h: s_h = q_h k_h^T * scale   (f32, in VMEM)
                p_h = softmax(s_h)
                acc += (p_h @ v_h) @ Wout[h]    <- out-projection folded
                                                   per head, no (T, 768)
                                                   attention buffer at all
    x1  = LN1(x + acc + bout)
    y   = gelu(x1 @ W1 + b1) @ W2 + b2
    out = LN2(x1 + y)

Why: at batch 32 x ~500 frames the XLA layer spends ~2.4 ms while its MXU
work is ~1.4 ms — the gap is HBM round-trips between ops and the serial
MXU->VPU->MXU chain per attention head (BENCH.md roofline). Fusing the
whole layer removes every intermediate HBM trip (qkv, attention output,
FFN mid never exist off-chip) and gives the in-order VLIW scheduler
independent MXU work (other heads' matmuls, the FFN) to overlap with the
softmax VPU time.

Numerics match models/hubert.py:TransformerLayer at the compute dtype:
f32 score/accumulator math, f32 LayerNorm stats (flax promotes), GELU
tanh-approximation in bf16 / exact erf in f32 (models/hubert.py:gelu).
Equivalence is tested in tests/test_pallas.py (interpret mode); the
compiled path is exercised on TPU by scripts/e2e_bench.py.

Reference context: the torch model is ``nn.TransformerEncoderLayer``
(post-norm) inside bshall/hubert, consumed by the reference via torch.hub
(reference convert.py:44, dataset/encode.py:16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu(x: jax.Array) -> jax.Array:
    # mirror models/hubert.py:gelu; exact-erf gelu via the A&S polynomial —
    # Mosaic has no erf/erfc primitive (round-5 on-TPU parity gate)
    from quickvc_tpu.ops.fused_extractor import _erf

    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return (0.5 * x * (1.0 + _erf(x * 0.7071067811865476))).astype(x.dtype)


def _layer_norm(x32: jax.Array, sc: jax.Array, bi: jax.Array,
                eps: float = 1e-5) -> jax.Array:
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * sc + bi


def _kernel(x_ref, win_ref, bin_ref, wout_ref, bout_ref, ln1s_ref, ln1b_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref, o_ref, *,
            scale: float, true_len: int, num_heads: int, head_dim: int):
    x = x_ref[0]                                     # (Tp, D) bf16/f32
    tp, d = x.shape
    cdt = x.dtype

    prec = jax.lax.Precision.HIGHEST if cdt == jnp.float32 else None
    # f32 keeps true-f32 MXU multiplicands (Mosaic default rounds to bf16;
    # round-5 on-TPU parity gate) — same rule as ops/fused_attention.py
    qkv = jax.lax.dot_general(x, win_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)
    qkv = (qkv + bin_ref[0].astype(jnp.float32)).astype(cdt)   # (Tp, 3D)

    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    sls = [slice(h * head_dim, (h + 1) * head_dim) for h in range(num_heads)]
    # stage-grouped per-head emission (ops/fused_attention.py): all score
    # matmuls, then all softmaxes, then the chained PV/out-proj matmuls —
    # gives the in-order scheduler independent MXU work to overlap the VPU
    # softmaxes.
    ss = []
    for sl in sls:
        s = jax.lax.dot_general(
            qkv[:, sl], qkv[:, d:][:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec) * scale
        if true_len < tp:
            s = jnp.where(col < true_len, s, -jnp.inf)
        ss.append(s)
    ps = [jax.nn.softmax(s, axis=-1) for s in ss]
    acc = bout_ref[0].astype(jnp.float32) + jnp.zeros((tp, d), jnp.float32)
    for h, (sl, p) in enumerate(zip(sls, ps)):
        o_h = jnp.dot(p.astype(cdt), qkv[:, 2 * d:][:, sl],
                      preferred_element_type=jnp.float32,
                      precision=prec)                          # (Tp, hd)
        acc = acc + jax.lax.dot_general(
            o_h.astype(cdt), wout_ref[pl.ds(h * head_dim, head_dim)],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec)

    x1_32 = _layer_norm(x.astype(jnp.float32) + acc, ln1s_ref[0], ln1b_ref[0])
    x1 = x1_32.astype(cdt)

    mid = jax.lax.dot_general(x1, w1_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)
    mid = _gelu((mid + b1_ref[0].astype(jnp.float32)).astype(cdt))
    y = jax.lax.dot_general(mid, w2_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    y = y + b2_ref[0].astype(jnp.float32)

    out = _layer_norm(x1.astype(jnp.float32) + y, ln2s_ref[0], ln2b_ref[0])
    o_ref[0] = out.astype(o_ref.dtype)


def fused_transformer_layer(x: jax.Array, layer_params, num_heads: int) -> jax.Array:
    """Apply one post-norm transformer layer, fully fused.

    x: (B, T, D); layer_params: the flax param subtree of
    models/hubert.py:TransformerLayer ({self_attn, norm1, linear1, linear2,
    norm2}). Returns (B, T, D) in x.dtype. TPU-only (callers keep the XLA
    path off-TPU).
    """
    p = layer_params
    b, t, d = x.shape
    head_dim = d // num_heads
    scale = 1.0 / float(head_dim) ** 0.5
    tp = -(-t // 128) * 128
    if tp != t:
        x = jnp.pad(x, [(0, 0), (0, tp - t), (0, 0)])

    cdt = x.dtype
    f32 = jnp.float32
    win = p["self_attn"]["in_proj_weight"].T.astype(cdt)        # (D, 3D)
    bin_ = p["self_attn"]["in_proj_bias"].reshape(1, -1).astype(f32)
    wout = p["self_attn"]["out_proj"]["kernel"].astype(cdt)     # (D, D)
    bout = p["self_attn"]["out_proj"]["bias"].reshape(1, -1).astype(f32)
    w1 = p["linear1"]["kernel"].astype(cdt)                     # (D, F)
    b1 = p["linear1"]["bias"].reshape(1, -1).astype(f32)
    w2 = p["linear2"]["kernel"].astype(cdt)                     # (F, D)
    b2 = p["linear2"]["bias"].reshape(1, -1).astype(f32)
    ln1s = p["norm1"]["scale"].reshape(1, -1).astype(f32)
    ln1b = p["norm1"]["bias"].reshape(1, -1).astype(f32)
    ln2s = p["norm2"]["scale"].reshape(1, -1).astype(f32)
    ln2b = p["norm2"]["bias"].reshape(1, -1).astype(f32)

    vec = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole array, resident

    kern = functools.partial(_kernel, scale=scale, true_len=t,
                             num_heads=num_heads, head_dim=head_dim)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + [vec] * 12,
        out_specs=pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), cdt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("parallel",),
            allow_input_fusion=[True] + [False] * 12),
    )(x, win, bin_, wout, bout, ln1s, ln1b, w1, b1, w2, b2, ln2s, ln2b)
    return out[:, :t]
