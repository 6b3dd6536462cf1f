"""H2D transfer cost of a production training batch over the axon tunnel.

VERDICT r3 item 1 diagnostics: the b64 x 512-frame batch is ~160 MB f32
(unit 33.5 + spec 84 + wave 42). If host->device transfer is slow or does
not overlap the running step, train.py wall time exceeds the 112 ms device
step. This probe measures, with serialized chained timing:

  1. pure H2D: device_put of a fresh batch + a scalar reduce fetched
     (the reduce forces arrival; its own cost is ~1 ms of HBM reads),
  2. H2D of batch k+1 while a ~100 ms compute chain on batch k runs
     (does the tunnel overlap transfer with execution?),
  3. the same batch pre-cast to bf16 on host (half the bytes) + the host
     cast cost itself.

    python scripts/h2d_probe.py [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def make_batch(rng, dtype=np.float32):
    return {
        "unit": rng.standard_normal((64, 512, 256)).astype(dtype),
        "spec": np.abs(rng.standard_normal((64, 512, 641))).astype(dtype),
        "wave": (rng.standard_normal((64, 512 * 320, 1)) * 0.1).astype(dtype),
    }


def nbytes(b):
    return sum(v.nbytes for v in b.values())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=8)
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    host = [make_batch(rng) for _ in range(2)]  # alternate: no caching
    mb = nbytes(host[0]) / 1e6
    print(f"batch payload: {mb:.1f} MB f32")

    reduce_fn = jax.jit(lambda b: jnp.float32(
        jnp.sum(b["unit"]) + jnp.sum(b["spec"]) + jnp.sum(b["wave"])))

    # ~100 ms of dependent compute, standing in for the train step
    w = jax.device_put(rng.standard_normal((4096, 4096)).astype(np.float32))

    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def burn(x, n_chain):
        def body(c, _):
            return jnp.tanh(c @ w), ()
        y, _ = jax.lax.scan(body, x, None, length=n_chain)
        return y

    x0 = jax.device_put(rng.standard_normal((4096, 4096)).astype(np.float32))
    # calibrate the burn chain length to ~100 ms
    burn(x0, 8).block_until_ready()
    t0 = time.perf_counter()
    float(jnp.sum(burn(x0, 64)))
    per_link = (time.perf_counter() - t0) / 64
    n_chain = max(8, int(0.100 / per_link))
    t0 = time.perf_counter()
    float(jnp.sum(burn(x0, n_chain)))
    burn_ms = (time.perf_counter() - t0) * 1e3
    print(f"burn chain: {n_chain} links = {burn_ms:.1f} ms")

    # -- 1. pure H2D (serialized: each iteration fetches the reduce) -------
    float(reduce_fn(jax.device_put(host[0])))  # compile + warm
    t0 = time.perf_counter()
    for i in range(args.iters):
        float(reduce_fn(jax.device_put(host[i % 2])))
    pure = (time.perf_counter() - t0) / args.iters
    print(f"pure H2D+reduce: {pure * 1e3:.1f} ms/batch "
          f"({mb / pure / 1e3:.2f} GB/s)")

    # -- 2. H2D overlapped with compute ------------------------------------
    # Issue the burn on the device, then the put; fetch burn result, then
    # the reduce. If transfer overlaps execution, total ~= max(burn, H2D)
    # + reduce; if serialized, ~= burn + H2D.
    t0 = time.perf_counter()
    for i in range(args.iters):
        y = burn(x0, n_chain)
        d = jax.device_put(host[i % 2])
        float(jnp.sum(y))
        float(reduce_fn(d))
    both = (time.perf_counter() - t0) / args.iters
    overlap = burn_ms / 1e3 + pure - both
    print(f"burn+H2D interleaved: {both * 1e3:.1f} ms/iter "
          f"(serial would be {(burn_ms / 1e3 + pure) * 1e3:.1f} ms; "
          f"overlap recovered {overlap * 1e3:.1f} ms)")

    # -- 3. bf16 host cast + half-size H2D ---------------------------------
    t0 = time.perf_counter()
    host16 = [{k: v.astype(jnp.bfloat16) for k, v in b.items()} for b in host]
    cast_ms = (time.perf_counter() - t0) / 2 * 1e3
    reduce16 = jax.jit(lambda b: jnp.float32(
        jnp.sum(b["unit"].astype(jnp.float32))
        + jnp.sum(b["spec"].astype(jnp.float32))
        + jnp.sum(b["wave"].astype(jnp.float32))))
    float(reduce16(jax.device_put(host16[0])))
    t0 = time.perf_counter()
    for i in range(args.iters):
        float(reduce16(jax.device_put(host16[i % 2])))
    pure16 = (time.perf_counter() - t0) / args.iters
    print(f"bf16 H2D+reduce: {pure16 * 1e3:.1f} ms/batch "
          f"({mb / 2 / pure16 / 1e3:.2f} GB/s) + host cast {cast_ms:.1f} ms")


if __name__ == "__main__":
    main()
