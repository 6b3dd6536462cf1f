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
