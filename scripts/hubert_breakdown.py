"""Fine-grained timing of the HuBERT-soft forward on TPU (batch 32 x 10 s).

Times each stage in isolation with chained timing (see bench.py:make_chained):
the 7 extractor convs, GroupNorm, exact-vs-tanh GELU, feature projection,
positional conv, each transformer sub-block (qkv, fused attention, out-proj,
FFN), to locate the remaining distance to roofline (BENCH.md).

    nohup python scripts/hubert_breakdown.py > /tmp/hubert_breakdown.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from quickvc_tpu.models.hubert import HubertSoft
from quickvc_tpu.ops.fused_attention import fused_attention_packed


def timeit(name, fn, *args, iters=20):
    """Chained timing: carry scalar perturbs the first arg each iteration."""

    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(a[0] + carry.astype(a[0].dtype), *a[1:])
            return (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
        return c

    out = chained(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        v = float(chained(*args))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(v), name
    print(f"{name}: {best / iters * 1e3:.3f} ms", flush=True)
    return best / iters


def main():
    rng = np.random.default_rng(0)
    B, T = 32, 160080
    dt = jnp.bfloat16
    wav = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1).astype(dt)

    hubert = HubertSoft()
    params = jax.jit(lambda: hubert.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16000), jnp.float32)))()["params"]

    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    # --- whole model --- (params passed as traced args, NOT closed over:
    # closed-over params become jit constants and blow the remote compile
    # helper's request-size limit)
    def full(w, p):
        return hubert.apply({"params": p}, w)
    timeit("hubert_full", full, wav, params)

    # --- feature extractor alone ---
    from quickvc_tpu.models.hubert import FeatureExtractor
    fe = FeatureExtractor()

    def extractor(w, p):
        return fe.apply({"params": p}, w[..., None])
    timeit("extractor_total", extractor, wav, params["feature_extractor"])

    # per-conv: run the chain up to layer i, timing increments
    from quickvc_tpu.models.layers import Conv1d

    def conv_chain(w, fp, n):
        x = w[..., None]
        ks = [(10, 5), (3, 2), (3, 2), (3, 2), (3, 2), (2, 2), (2, 2)]
        for i in range(n):
            k, s = ks[i]
            kern = fp[f"conv{i}"]["kernel"].astype(x.dtype)
            x = jax.lax.conv_general_dilated(
                x, kern, (s,), [(0, 0)], dimension_numbers=("NHC", "HIO", "NHC"))
            if i == 0:
                sc = fp["norm0"]["scale"]
                bi = fp["norm0"]["bias"]
                m = jnp.mean(x.astype(jnp.float32), axis=1, keepdims=True)
                v = jnp.var(x.astype(jnp.float32), axis=1, keepdims=True)
                x = ((x.astype(jnp.float32) - m) / jnp.sqrt(v + 1e-5)).astype(x.dtype)
                x = x * sc.astype(x.dtype) + bi.astype(x.dtype)
            x = jax.nn.gelu(x, approximate=False)
        return x

    prev = 0.0
    for n in range(1, 8):
        t = timeit(f"conv_chain_{n}", lambda w, fp, n=n: conv_chain(w, fp, n),
                   wav, params["feature_extractor"])
        print(f"  conv{n - 1} increment: {(t - prev) * 1e3:.3f} ms", flush=True)
        prev = t

    # GELU cost in isolation on the conv0-sized tensor
    big = jnp.asarray(rng.standard_normal((B, 32015, 512)).astype(np.float32)).astype(dt)
    timeit("gelu_exact_conv0sized", lambda x: jax.nn.gelu(x, approximate=False), big)
    timeit("gelu_tanh_conv0sized", lambda x: jax.nn.gelu(x, approximate=True), big)

    # conv1 as conv vs as strided-reshape matmul
    k1 = params["feature_extractor"]["conv1"]["kernel"].astype(dt)  # (3, 512, 512)

    def conv1_conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2,), [(0, 0)], dimension_numbers=("NHC", "HIO", "NHC"))

    def conv1_matmul(x, k):
        # out[t] = W0 x[2t] + W1 x[2t+1] + W2 x[2t+2]
        n = (x.shape[1] - 3) // 2 + 1
        e = x[:, 0::2]
        o = x[:, 1::2]
        return (e[:, :n] @ k[0] + o[:, :n] @ k[1] + e[:, 1:n + 1] @ k[2])

    timeit("conv1_as_conv", conv1_conv, big, k1)
    timeit("conv1_as_matmul", conv1_matmul, big, k1)

    # --- transformer stage costs ---
    F = 500
    x = jnp.asarray(rng.standard_normal((B, F, 768)).astype(np.float32)).astype(dt)
    lp = params["layer_0"]

    def qkv(z, p):
        w = p["self_attn"]["in_proj_weight"].astype(z.dtype)
        b = p["self_attn"]["in_proj_bias"].astype(z.dtype)
        return z @ w.T + b
    timeit("qkv_proj", qkv, x, lp, iters=20)

    qkv_out = qkv(x, lp)
    q, k, v = jnp.split(qkv_out, 3, axis=-1)

    def attn(qq, kk, vv):
        return fused_attention_packed(qq, kk, vv, num_heads=12, scale=1.0 / 8.0)
    timeit("fused_attention_1layer", attn, q, k, v)

    def attn_xla(qq, kk, vv):
        def heads(z):
            return z.reshape(B, F, 12, 64).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", heads(qq), heads(kk)).astype(jnp.float32) / 8.0
        p = jax.nn.softmax(s, axis=-1).astype(vv.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, heads(vv))
        return o.transpose(0, 2, 1, 3).reshape(B, F, 768)
    timeit("xla_attention_1layer", attn_xla, q, k, v)

    def ffn(z, p):
        w1 = p["linear1"]["kernel"].astype(z.dtype)
        b1 = p["linear1"]["bias"].astype(z.dtype)
        w2 = p["linear2"]["kernel"].astype(z.dtype)
        b2 = p["linear2"]["bias"].astype(z.dtype)
        f = jax.nn.gelu(z @ w1 + b1, approximate=False)
        return f @ w2 + b2
    timeit("ffn_1layer", ffn, x, lp)

    from quickvc_tpu.models.hubert import TransformerLayer
    tl = TransformerLayer()

    def one_layer(z, p):
        return tl.apply({"params": p}, z)
    timeit("transformer_1layer", one_layer, x, lp)


if __name__ == "__main__":
    main()
