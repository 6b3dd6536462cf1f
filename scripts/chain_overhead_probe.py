"""Isolate the fixed per-iteration cost of the chained-timing harness.

matmul_probe.py shows small matmuls ~10x off peak while an 8k square hits
84% — consistent with a ~0.9 ms fixed cost per chain iteration. Variants:

A. mean-carry (the harness as-is) on the qkv shape
B. slice-carry: carry = out[0, 0] (is the full-output mean the cost?)
C. k dependent matmuls per iteration (does per-matmul time fall toward
   theory when the per-iteration cost is amortized?)

    python scripts/chain_overhead_probe.py   # TPU
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    m, k, n = 16384, 768, 768
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.03, jnp.bfloat16)
    iters = 30
    flops = 2 * m * k * n

    def timed(chained, *args, per_iter_matmuls=1):
        out = chained(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            val = float(chained(*args))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(val)
        dt = best / iters / per_iter_matmuls
        return dt, flops / dt / 1e12

    @jax.jit
    def chain_mean(x, w):
        def body(c, _):
            out = (x + c.astype(jnp.bfloat16)) @ w
            return (jnp.mean(out) * 1e-12).astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
        return c

    @jax.jit
    def chain_slice(x, w):
        def body(c, _):
            out = (x + c.astype(jnp.bfloat16)) @ w
            return (out[0, 0] * 1e-12).astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
        return c

    def make_chain_deep(depth):
        @jax.jit
        def chain_deep(x, w):
            def body(c, _):
                out = x + c.astype(jnp.bfloat16)
                for _ in range(depth):
                    out = out @ w
                return (out[0, 0] * 1e-12).astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
            return c
        return chain_deep

    for label, fn, per in (
        ("A mean-carry, 1 matmul/iter ", chain_mean, 1),
        ("B slice-carry, 1 matmul/iter", chain_slice, 1),
        ("C slice-carry, 4 matmul/iter", make_chain_deep(4), 4),
        ("D slice-carry, 16 matmul/iter", make_chain_deep(16), 16),
    ):
        dt, tf = timed(fn, x, w, per_iter_matmuls=per)
        print(f"{label}: {dt*1e3:.3f} ms/matmul  {tf:.1f} TFLOP/s "
              f"({tf/197*100:.0f}% of peak)")


if __name__ == "__main__":
    main()
