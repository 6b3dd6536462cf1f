"""Pin down the source of the ~0.73 ms fixed per-iteration chain cost.

Variants (all 30 dependent 16384x768 @ 768x768 bf16 matmuls, one jit):

E. matrix-carry scan: carry IS the activation matrix (no scalar collapse,
   no broadcast) — isolates lax.scan/while overhead itself.
F. matrix-carry, python-unrolled (no scan at all).
G. scalar-carry, python-unrolled — scalar collapse kept, scan removed.

    python scripts/chain_overhead_probe2.py   # TPU
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
    # spectral-normalized-ish so 30 chained applications stay finite
    w = jnp.asarray(rng.standard_normal((k, k)) * 0.02, jnp.bfloat16)
    iters = 30
    flops = 2 * m * k * k

    def timed(chained, *args):
        out = chained(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            val = float(np.asarray(chained(*args)).ravel()[0])
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(val)
        dt = best / iters
        return dt, flops / dt / 1e12

    @jax.jit
    def chain_matrix_scan(x, w):
        def body(c, _):
            return c @ w, None
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c[0, 0]

    @jax.jit
    def chain_matrix_unrolled(x, w):
        c = x
        for _ in range(iters):
            c = c @ w
        return c[0, 0]

    @jax.jit
    def chain_scalar_unrolled(x, w):
        s = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            out = (x + s.astype(jnp.bfloat16)) @ w
            s = (out[0, 0] * 1e-12).astype(jnp.float32)
        return s

    for label, fn in (
        ("E matrix-carry scan     ", chain_matrix_scan),
        ("F matrix-carry unrolled ", chain_matrix_unrolled),
        ("G scalar-carry unrolled ", chain_scalar_unrolled),
    ):
        dt, tf = timed(fn, x, w)
        print(f"{label}: {dt*1e3:.3f} ms/matmul  {tf:.1f} TFLOP/s "
              f"({tf/197*100:.0f}% of peak)")


if __name__ == "__main__":
    main()
