"""Can Mosaic reach the v5e's 2x int8 MXU rate where XLA does not?

BENCH.md "int8 was also evaluated ... and rejected" measured XLA's int8
`dot_general` at only ~13% over bf16 on the HuBERT FFN shape — far from
the 2x paper rate (v5e: 394 int8 TOPS vs 197 bf16 TFLOPS). This probe
asks whether a Pallas tiled matmul with s8 x s8 -> s32 `dot` engages the
native rate. If it does, an int8 serving path for the HuBERT matmuls
(which dominate e2e conversion cost) becomes worth building; if not, the
rejection holds at the kernel level too.

Shape: 16 FFN matmuls' worth of FLOPs folded into one K-major GEMM
(16384 x 12288) @ (12288 x 3072) = 1.24 TFLOP — big enough that the
~0.9 ms chained-timing overhead (BENCH.md) is <15% of even the ideal
int8 time (~3.1 ms at rate).

    nohup python scripts/int8_matmul_probe.py > /tmp/int8_probe.log 2>&1 &
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 16384, 12288, 3072
FLOPS = 2 * M * K * N


def timeit(name, fn, *args, iters=8):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(jax.tree.map(lambda t: t + carry.astype(t.dtype), a[0]),
                     *a[1:])
            s = jnp.sum(out.astype(jnp.float32))
            return (s * 1e-12).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=iters)
        return c

    out = chained(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        v = float(chained(*args))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(v), name
    per = best / iters
    print(f"{name}: {per * 1e3:.3f} ms  ({FLOPS / per / 1e12:.1f} TOP/s)",
          flush=True)
    return per


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k, acc_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def pallas_mm(a, b, bm=256, bn=512, bk=3072):
    acc_dtype = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
    n_k = K // bk
    return pl.pallas_call(
        functools.partial(_mm_kernel, n_k=n_k, acc_dtype=acc_dtype),
        grid=(M // bm, N // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(a, b)


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr,
          flush=True)
    a8 = jnp.asarray(rng.integers(-127, 128, (M, K), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))
    abf = (a8.astype(jnp.float32) / 127.0).astype(jnp.bfloat16)
    bbf = (b8.astype(jnp.float32) / 127.0).astype(jnp.bfloat16)

    def xla_dot(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if x.dtype == jnp.int8
            else jnp.float32)

    # correctness first (tiny slices, exact in int32)
    got = np.asarray(pallas_mm(a8, b8))[:8, :8]
    want = np.asarray(xla_dot(a8, b8))[:8, :8]
    np.testing.assert_array_equal(got, want)
    print("int8 pallas == xla (exact)", flush=True)

    def safe(name, fn, *args):
        try:
            timeit(name, fn, *args)
        except Exception as e:  # VMEM OOM at a tile point is data, not fatal
            print(f"{name}: FAILED ({str(e).splitlines()[0][:120]})",
                  flush=True)

    safe("xla_bf16", xla_dot, abf, bbf)
    safe("xla_int8", xla_dot, a8, b8)
    safe("pallas_bf16", pallas_mm, abf, bbf)
    safe("pallas_int8", pallas_mm, a8, b8)
    # tile sweep for the int8 kernel (s8 tiles are half the bytes of bf16)
    for bm, bn, bk in ((256, 1024, 3072), (512, 512, 3072), (512, 1024, 2048),
                       (512, 1024, 1024), (1024, 512, 2048)):
        safe(f"pallas_int8_{bm}x{bn}x{bk}",
             lambda x, y, bm=bm, bn=bn, bk=bk: pallas_mm(x, y, bm, bn, bk),
             a8, b8)


if __name__ == "__main__":
    main()
