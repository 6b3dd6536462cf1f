"""H2D scaling probe: fixed overhead vs per-byte cost on the axon tunnel.

Transfers single contiguous arrays of several sizes/dtypes and times a
forced-arrival reduce; also times the reduce alone on device-resident data
to subtract its cost.

    python scripts/h2d_probe2.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    rng = np.random.default_rng(0)
    red = jax.jit(lambda x: jnp.float32(jnp.sum(x.astype(jnp.float32))))

    # reduce-alone baseline on device-resident 160 MB
    big = jax.device_put(rng.standard_normal(40_000_000).astype(np.float32))
    float(red(big))
    t0 = time.perf_counter()
    for _ in range(4):
        float(red(big))
    base = (time.perf_counter() - t0) / 4
    print(f"reduce alone (160 MB on-device): {base * 1e3:.1f} ms")

    for mbytes in (1, 4, 16, 64, 160):
        for dtype, name in ((np.float32, "f32"), (np.uint8, "u8-random"),
                            (np.int16, "s16-audio")):
            n = mbytes * 1_000_000 // np.dtype(dtype).itemsize
            if dtype == np.uint8:
                a = rng.integers(0, 256, n, dtype=np.uint8)
                b = rng.integers(0, 256, n, dtype=np.uint8)
            elif dtype == np.int16:
                a = (np.sin(np.arange(n) * 0.05) * 20000).astype(np.int16)
                b = (np.sin(np.arange(n) * 0.07) * 20000).astype(np.int16)
            else:
                a = rng.standard_normal(n).astype(np.float32)
                b = rng.standard_normal(n).astype(np.float32)
            pair = [a, b]
            float(red(jax.device_put(a)))  # warm shape
            iters = 4
            t0 = time.perf_counter()
            for i in range(iters):
                float(red(jax.device_put(pair[i % 2])))
            dt = (time.perf_counter() - t0) / iters
            print(f"{mbytes:4d} MB {name:10s}: {dt * 1e3:8.1f} ms  "
                  f"({mbytes / 1e3 / dt:6.3f} GB/s)")


if __name__ == "__main__":
    main()
