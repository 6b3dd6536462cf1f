"""Decisive chain-cost probe: both structures in one process, interleaved.

H. scan, 16 dependent matmuls per iteration (probe1-D structure)
I. fully unrolled 30 dependent matmuls, no scan (probe2-F structure)

Run order H I H I to separate structure from tunnel drift.

    python scripts/chain_overhead_probe3.py   # TPU
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
    m, k = 16384, 768
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, k)) * 0.03, jnp.bfloat16)
    iters = 30
    flops = 2 * m * k * k

    @jax.jit
    def chain_scan16(x, w):
        def body(c, _):
            out = x + c.astype(jnp.bfloat16)
            for _ in range(16):
                out = out @ w
            return (out[0, 0] * 1e-12).astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
        return c

    @jax.jit
    def chain_unrolled30(x, w):
        c = x
        for _ in range(30):
            c = c @ w
        return c[0, 0]

    def run(label, fn, n_mm):
        out = fn(x, w)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            val = float(np.asarray(fn(x, w)).ravel()[0])
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(val), val
        dt = best / n_mm
        print(f"{label}: {dt*1e3:.3f} ms/matmul  {flops/dt/1e12:.1f} TFLOP/s")

    for rep in range(2):
        run(f"H scan 16/iter   (rep {rep})", chain_scan16, iters * 16)
        run(f"I unrolled 30    (rep {rep})", chain_unrolled30, 30)


if __name__ == "__main__":
    main()
