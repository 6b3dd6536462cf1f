"""Backward-pass experiments for the WN stacks and the speaker LSTM.

scripts/train_breakdown.py shows the generator vjp pullback at ~7x the
forward. This harness A/B-tests candidate fixes at training shapes
(batch 64 x 512 frames, bf16):

- WaveNet (16 layers, h=192, gin=256):
  * nn.scan (current)            — O(1) HLO, scan backward
  * nn.scan unroll=4/8/16        — lax.scan unrolling: XLA fuses across layers
  * python loop (fully unrolled) — per-layer params, maximal fusion freedom
  * nn.remat over the scanned layer — recompute instead of loading residuals
- LSTM (3 x 256 over 512 steps): scan vs unroll=4/16.

Chained timing (see bench.py:make_chained).

    nohup python scripts/bwd_experiments.py > /tmp/bwd_experiments.log 2>&1 &
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import flax.linen as nn
import jax
import jax.numpy as jnp

from quickvc_tpu.models.layers import WNConv1d
from quickvc_tpu.models.modules import WNLayer


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
    for _ in range(2):
        t0 = time.perf_counter()
        v = float(chained(*args))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(v), name
    print(f"{name}: {best / iters * 1e3:.3f} ms", flush=True)
    return best / iters


class WaveNetVariant(nn.Module):
    hidden_channels: int
    kernel_size: int = 5
    n_layers: int = 16
    gin_channels: int = 256
    mode: str = "scan"          # scan | loop
    unroll: int = 1
    remat: bool = False

    @nn.compact
    def __call__(self, x, g):
        h, L = self.hidden_channels, self.n_layers
        b = x.shape[0]
        g_all = WNConv1d(2 * h * L, 1, name="cond_layer")(g)
        tg = g_all.shape[1]
        g_stack = g_all.reshape(b, tg, L, 2 * h).transpose(2, 0, 1, 3)
        if tg == 1:
            g_stack = jnp.broadcast_to(g_stack, (L, b, 1, 2 * h))

        if self.mode == "loop":
            out = jnp.zeros_like(x)
            for i in range(L):
                x_in = WNConv1d(2 * h, self.kernel_size, name=f"in_{i}")(x) + g_stack[i]
                acts = jnp.tanh(x_in[..., :h]) * jax.nn.sigmoid(x_in[..., h:])
                res_skip = WNConv1d(2 * h, 1, name=f"res_skip_{i}")(acts)
                x = x + res_skip[..., :h]
                out = out + res_skip[..., h:]
            return out

        target = WNLayer
        if self.remat:
            target = nn.remat(WNLayer, prevent_cse=False)
        scan = nn.scan(
            target,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0,
            length=L,
            unroll=self.unroll,
        )
        (xf, output), _ = scan(h, self.kernel_size, name="layers")(
            (x, jnp.zeros_like(x)), g_stack)
        return output


class LSTMVariant(nn.Module):
    hidden_size: int = 256
    num_layers: int = 3
    unroll: int = 1

    @nn.compact
    def __call__(self, x):
        bsz = x.shape[0]
        hsz = self.hidden_size
        for layer in range(self.num_layers):
            in_ch = x.shape[-1]
            init = nn.initializers.uniform(0.0625)
            w_ih = self.param(f"w_ih_l{layer}", init, (4 * hsz, in_ch))
            w_hh = self.param(f"w_hh_l{layer}", init, (4 * hsz, hsz))
            b = self.param(f"b_l{layer}", init, (4 * hsz,))
            x_proj = x @ w_ih.T.astype(x.dtype) + b.astype(x.dtype)

            def step(carry, xp, w_hh=w_hh):
                h, c = carry
                gates = xp + h @ w_hh.T.astype(xp.dtype)
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
                g = jnp.tanh(g)
                c = f * c + i * g
                h = o * jnp.tanh(c)
                return (h, c), h

            carry0 = (jnp.zeros((bsz, hsz), x.dtype), jnp.zeros((bsz, hsz), x.dtype))
            (hf, _), hs = jax.lax.scan(step, carry0, x_proj.swapaxes(0, 1),
                                       unroll=self.unroll)
            x = hs.swapaxes(0, 1)
        return hf


def main():
    b, t, h = 64, 512, 192
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, h)).astype(np.float32)).astype(dt)
    g = jnp.asarray(rng.standard_normal((b, 1, 256)).astype(np.float32)).astype(dt)
    mel = jnp.asarray(rng.standard_normal((b, t, 80)).astype(np.float32)).astype(dt)
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr, flush=True)

    def grad_of(apply_fn):
        def run(xx, p, *rest):
            def scalar(args):
                out = apply_fn(args[1], args[0], *rest)
                return jnp.sum(out.astype(jnp.float32))
            return jax.grad(scalar)((xx, p))
        return run

    variants = [
        ("wn_scan", dict(mode="scan", unroll=1)),
        ("wn_scan_u4", dict(mode="scan", unroll=4)),
        ("wn_scan_u16", dict(mode="scan", unroll=16)),
        ("wn_loop", dict(mode="loop")),
        ("wn_scan_remat", dict(mode="scan", unroll=1, remat=True)),
        ("wn_scan_u16_remat", dict(mode="scan", unroll=16, remat=True)),
    ]
    for name, kw in variants:
        m = WaveNetVariant(h, **kw)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x, g)["params"]

        def fwd(xx, pp, m=m):
            return m.apply({"params": pp}, xx, g)
        timeit(f"{name}_fwd", fwd, x, p)
        timeit(f"{name}_fwdbwd", grad_of(lambda pp, xx, m=m: m.apply({"params": pp}, xx, g)), x, p)

    for name, u in [("lstm", 1), ("lstm_u4", 4), ("lstm_u16", 16)]:
        m = LSTMVariant(unroll=u)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), mel)["params"]

        def fwd(xx, pp, m=m):
            return m.apply({"params": pp}, xx)
        timeit(f"{name}_fwd", fwd, mel, p)
        timeit(f"{name}_fwdbwd", grad_of(lambda pp, xx, m=m: m.apply({"params": pp}, xx)), mel, p)


if __name__ == "__main__":
    main()
