"""MXU roofline probe: pure bf16 matmul rates for the shapes we actually run.

Distinguishes "our graphs leave MXU idle" from "this is the chip's real rate
for that shape" — e.g. the HuBERT FFN matmul (16384x768 @ 768x3072) and the
theoretical-ceiling square matmul. Chained timing per BENCH.md methodology.

    python scripts/matmul_probe.py        # TPU (default env)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quickvc_tpu.utils.profiling import time_chained

    rng = np.random.default_rng(0)
    # (label, M, K, N): HuBERT qkv/out-proj, FFN in, FFN out, decoder-ish,
    # and big squares as the achievable-ceiling reference.
    shapes = [
        ("hubert_qkv   ", 16384, 768, 768),
        ("hubert_ffn_in", 16384, 768, 3072),
        ("hubert_ffn_out", 16384, 3072, 768),
        ("square_4k    ", 4096, 4096, 4096),
        ("square_8k    ", 8192, 8192, 8192),
    ]
    iters = 30
    for label, m, k, n in shapes:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

        def mm(carry, x, w):
            return (x + carry.astype(jnp.bfloat16)) @ w

        dt = time_chained(mm, iters, x, w) / iters
        tflops = 2 * m * k * n / dt / 1e12
        print(f"{label} ({m}x{k} @ {k}x{n}) bf16: {dt*1e3:.3f} ms  "
              f"{tflops:.1f} TFLOP/s ({tflops/197*100:.0f}% of v5e peak)")


if __name__ == "__main__":
    main()
