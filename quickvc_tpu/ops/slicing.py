"""Random segment slicing (training-time crops).

Parity target: reference ``commons.slice_segments`` / ``rand_slice_segments``
(commons.py:20-56). The reference slices with a per-item Python loop on
device tensors (a per-step hot-loop hazard); here it is a single vmapped
``lax.dynamic_slice`` — one fused gather, no host sync, jittable.

Layouts are time-major: series ``(B, T, C)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def slice_segments(series: jax.Array, start_indices: jax.Array, segment_size: int) -> jax.Array:
    """Per-item dynamic slice: (B, T, C), (B,) -> (B, segment_size, C)."""

    def one(s, i):
        return jax.lax.dynamic_slice_in_dim(s, i, segment_size, axis=0)

    return jax.vmap(one)(series, start_indices)


def rand_slice_segments(
    rng: jax.Array, series: jax.Array, segment_size: int,
    lengths: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Uniform-random segment per item; returns (segments, start_indices).

    With ``lengths`` given, slices from each item's effective region
    [0, length - segment_size] (reference ``rand_spec_segments``,
    data_utils_new_new.py:133-153); otherwise from the padded extent with
    the reference's +1 convention (commons.py:50-51).
    """
    b, t, _ = series.shape
    if lengths is None:
        max_start = jnp.full((b,), t - segment_size + 1, jnp.float32)
    else:
        max_start = (lengths - segment_size).astype(jnp.float32)
    u = jax.random.uniform(rng, (b,))
    starts = (u * max_start).astype(jnp.int32)
    return slice_segments(series, starts, segment_size), starts
