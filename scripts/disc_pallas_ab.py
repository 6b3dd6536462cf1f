"""VERDICT-r2 item 5a: attack the 36 ms discriminator backward from Pallas.

Three angles, measured per sub-discriminator at training shapes (paired
batch 128 x 10240 samples, bf16), chained timing:

1. ``baseline``  — the shipped WNConv2d stack (BENCH.md: ~7.6 ms/disc grad).
2. ``outscale``  — weight-norm applied to the conv OUTPUT (y * g/||v||)
   instead of normalizing the kernel: mathematically identical (convs are
   linear in the kernel), but changes what XLA fuses into the conv
   backward.
3. ``pallas_l5`` — layer 5 (1024->1024, (5,1), stride 1 — the heaviest
   single layer) runs as the fused Pallas shift-matmul conv with custom
   VJP (ops/fused_disc_conv.py); weight-norm scale folded into the kernel.

Plus the isolated L5 layer A/B (XLA conv+LReLU vs Pallas) at exact stack
shapes. Record the accept/reject verdict in BENCH.md.

    nohup python scripts/disc_pallas_ab.py > /tmp/disc_pallas_ab.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import flax.linen as nn
import jax
import jax.numpy as jnp

from quickvc_tpu.models.discriminators import WNConv2d
from quickvc_tpu.models.layers import leaky_relu, _torch_conv_init


def timeit(name, fn, *args, iters=10):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(jax.tree.map(lambda t: t + carry.astype(t.dtype), a[0]), *a[1:])
            leaves = [x for x in jax.tree.leaves(out)
                      if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)]
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
            return (s * 1e-12).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
        return c

    out = chained(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        v = float(chained(*args))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(v), name
    print(f"{name}: {best / iters * 1e3:.3f} ms", flush=True)
    return best / iters


class WNConv2dOutScale(nn.Module):
    """Weight-norm as an output-channel scale: y = conv(x, v) * g/||v|| + b."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        init = _torch_conv_init(kh * kw, in_ch)
        v = self.param("v", init, (kh, kw, in_ch, self.features))
        g = self.param("g", lambda key, shape: jnp.linalg.norm(
            init(key, (kh, kw, in_ch, self.features)).reshape(-1, self.features),
            axis=0), (self.features,))
        y = jax.lax.conv_general_dilated(
            x, v.astype(x.dtype), window_strides=self.strides,
            padding=[(self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        scale = g / jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2)) + 1e-12)
        bias = self.param("bias", init, (self.features,))
        return y * scale.astype(y.dtype) + bias.astype(y.dtype)


class DiscPVariant(nn.Module):
    """DiscriminatorP with a selectable conv implementation."""

    period: int
    mode: str = "baseline"  # baseline | outscale | pallas_l5

    @nn.compact
    def __call__(self, x):
        b, t, _ = x.shape
        p = self.period
        if t % p:
            x = jnp.pad(x, [(0, 0), (0, p - t % p), (0, 0)], mode="reflect")
            t = x.shape[1]
        x = x.reshape(b, t // p, p, 1)
        conv = WNConv2dOutScale if self.mode == "outscale" else WNConv2d
        for ch in (32, 128, 512, 1024):
            x = conv(ch, (5, 1), (3, 1), (2, 0))(x)
            x = leaky_relu(x)
        if self.mode == "pallas_l5":
            from quickvc_tpu.ops.fused_disc_conv import conv5_lrelu

            init = _torch_conv_init(5, 1024)
            v = self.param("l5_v", init, (5, 1, 1024, 1024))
            g = self.param("l5_g", lambda key, shape: jnp.linalg.norm(
                init(key, (5, 1, 1024, 1024)).reshape(-1, 1024), axis=0),
                (1024,))
            bias = self.param("l5_bias", init, (1024,))
            kern = ((g / jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2)) + 1e-12))
                    * v)[:, 0]  # (5, 1024, 1024)
            bb, rows, pp, cc = x.shape
            xf = x.transpose(0, 2, 1, 3).reshape(bb * pp, rows, cc)
            y = conv5_lrelu(xf, kern.astype(x.dtype), bias.astype(x.dtype), 0.1)
            x = y.reshape(bb, pp, rows, cc).transpose(0, 2, 1, 3)
        else:
            x = conv(1024, (5, 1), (1, 1), (2, 0))(x)
            x = leaky_relu(x)
        x = WNConv2d(1, (3, 1), (1, 1), (1, 0))(x)
        return x.reshape(b, -1)


def isolated_l5(rng, period):
    """The L5 layer alone at exact stack shapes, XLA vs Pallas, fwd+grad."""
    from quickvc_tpu.ops.fused_disc_conv import conv5_lrelu, conv5_lrelu_reference

    rows = -(-10240 // period) // 27  # after 3 stride-3 convs
    n = 128 * period
    x = jnp.asarray(rng.standard_normal((n, rows, 1024)).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((5, 1024, 1024)).astype(np.float32) * 0.02
                    ).astype(jnp.bfloat16)
    b = jnp.zeros((1024,), jnp.bfloat16)

    for name, f in (("xla", conv5_lrelu_reference), ("pallas", conv5_lrelu)):
        timeit(f"L5_p{period}_{name}_fwd", lambda xx, kk, bb, f=f: f(xx, kk, bb, 0.1),
               x, k, b)

        def grad(xx, kk, f=f):
            def loss(q):
                return jnp.sum(f(xx, q, b, 0.1).astype(jnp.float32) ** 2)
            return jax.grad(loss)(kk)
        timeit(f"L5_p{period}_{name}_grad", grad, x, k)


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr, flush=True)
    x = jnp.asarray(rng.standard_normal((128, 10240, 1)).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)

    for period in (2, 11):
        isolated_l5(rng, period)

    for period in (2, 5, 11):
        for mode in ("baseline", "outscale", "pallas_l5"):
            m = DiscPVariant(period, mode)
            p = jax.jit(m.init)(jax.random.PRNGKey(0), x)["params"]

            def grad(xx, q, m=m):
                def loss(qq):
                    logit = m.apply({"params": qq}, xx)
                    return jnp.mean((logit.astype(jnp.float32) - 1) ** 2)
                return jax.grad(loss)(q)
            timeit(f"disc_p{period}_{mode}_grad", grad, x, p)


if __name__ == "__main__":
    main()
