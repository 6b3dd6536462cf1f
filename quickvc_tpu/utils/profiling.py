"""Tracing / profiling harness.

The reference carries only a commented-out torch.profiler block
(train.py:109-115). Here profiling is a first-class utility:

- ``trace(log_dir)``: context manager around ``jax.profiler`` —
  captures an XLA trace viewable in TensorBoard / Perfetto.
- ``timed(fn, *args)``: wall-time a jitted call with proper device
  synchronization (``block_until_ready`` on all outputs).
- The training loop exposes ``--profile-steps`` via train.py: traces that
  many steps after warmup into ``model_dir/profile``.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, iters: int = 1):
    """(seconds, last_output) for iters sequential calls, fully synced."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0, out


def time_chained(fn, iters, *args):
    """Seconds for ``iters`` serialized runs of ``fn(carry, *args)``.

    The canonical timing method on the remote-execution tunnel, where
    ``block_until_ready`` can return before compute finishes and naive
    loops over-report by ~70x (BENCH.md): each iteration's input depends on
    the previous output (scaled to ~1e-15 so numerics are unperturbed), the
    loop runs as ONE jitted ``lax.scan``, and fetching the final scalar
    forces completion. Two timed repetitions, min taken — the first run
    after a compile can overlap residual warmup on the tunnel.
    """
    import numpy as np
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(carry, *a)
            return (jnp.mean(out) * 1e-12).astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=iters)
        return carry

    out = chained(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        val = float(chained(*args))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(val)
    return best
