"""Per-sub-discriminator grad timing: which of the 6 stacks eats the 36 ms?

Times forward and param-grad for DiscriminatorS and each DiscriminatorP
separately at training shapes (paired batch 128 x 10240 samples, bf16),
plus DiscriminatorS variants (plain vs grouped convs) to expose the cost
of grouped-conv backward on TPU.

    nohup python scripts/disc_breakdown.py > /tmp/disc_breakdown.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from quickvc_tpu.models.discriminators import DiscriminatorP, DiscriminatorS


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


def main():
    rng = np.random.default_rng(0)
    # paired batch as in the D phase: 2 x 64
    x = jnp.asarray(rng.standard_normal((128, 10240, 1)).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr, flush=True)

    discs = [("disc_s", DiscriminatorS())]
    discs += [(f"disc_p{p}", DiscriminatorP(p)) for p in (2, 3, 5, 7, 11)]

    for name, m in discs:
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x)["params"]

        def fwd(xx, pp, m=m):
            return m.apply({"params": pp}, xx)[0]
        timeit(f"{name}_fwd", fwd, x, p)

        def grad(xx, pp, m=m):
            def loss(q):
                logit, _ = m.apply({"params": q}, xx)
                return jnp.mean((logit.astype(jnp.float32) - 1) ** 2)
            return jax.grad(loss)(pp)
        timeit(f"{name}_grad", grad, x, p)

    # ---- variant: DiscriminatorP with the period axis folded into batch ----
    # (B, T, 1) -> (B, T/p, p, 1) -> (B*p, T/p, 1): the (5,1) 2-D convs become
    # pure 1-D convs; numerics identical up to output ordering.
    import flax.linen as nn
    from quickvc_tpu.models.layers import WNConv1d, leaky_relu

    class DiscPFold(nn.Module):
        period: int
        weight_norm: bool = True

        @nn.compact
        def __call__(self, x):
            b, t, _ = x.shape
            p = self.period
            if t % p:
                x = jnp.pad(x, [(0, 0), (0, p - t % p), (0, 0)], mode="reflect")
                t = x.shape[1]
            x = x.reshape(b, t // p, p, 1).transpose(0, 2, 1, 3).reshape(b * p, t // p, 1)
            from quickvc_tpu.models.layers import Conv1d
            conv = WNConv1d if self.weight_norm else Conv1d
            for ch in (32, 128, 512, 1024):
                x = conv(ch, 5, stride=3, padding=2)(x)
                x = leaky_relu(x)
            x = conv(1024, 5, padding=2)(x)
            x = leaky_relu(x)
            x = conv(1, 3, padding=1)(x)
            return x.reshape(b, -1)

    for p_, wn in [(2, True), (11, True), (2, False)]:
        name = f"disc_p{p_}fold" + ("" if wn else "_plainconv")
        m = DiscPFold(p_, weight_norm=wn)
        pp = jax.jit(m.init)(jax.random.PRNGKey(0), x)["params"]

        def fwd(xx, q, m=m):
            return m.apply({"params": q}, xx)
        timeit(f"{name}_fwd", fwd, x, pp)

        def grad(xx, q, m=m):
            def loss(qq):
                logit = m.apply({"params": qq}, xx)
                return jnp.mean((logit.astype(jnp.float32) - 1) ** 2)
            return jax.grad(loss)(q)
        timeit(f"{name}_grad", grad, x, pp)


if __name__ == "__main__":
    main()
