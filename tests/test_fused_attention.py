"""Fused-attention op: packed-layout semantics vs plain einsum attention.

On CPU this exercises the fallback path (the Pallas kernel itself is
validated on TPU — see BENCH.md roofline notes); the test pins the packed
(B, T, H*D) contract the HuBERT transformer relies on.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quickvc_tpu.ops.fused_attention import fused_attention, fused_attention_packed


def einsum_attention_packed(q, k, v, num_heads, scale):
    b, t, hd_all = q.shape
    d = hd_all // num_heads

    def heads(z):
        return z.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, t, hd_all)


@pytest.mark.parametrize("b,h,t,d", [(2, 4, 37, 16), (1, 12, 128, 64)])
def test_packed_matches_einsum(rng, b, h, t, d):
    q = jnp.asarray(rng.standard_normal((b, t, h * d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h * d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h * d)).astype(np.float32))
    scale = 1.0 / np.sqrt(d)
    out = jax.jit(lambda q, k, v: fused_attention_packed(q, k, v, h, scale))(q, k, v)
    ref = einsum_attention_packed(q, k, v, h, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_headed_matches_einsum(rng):
    b, h, t, d = 2, 3, 50, 8
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    scale = 0.25
    out = jax.jit(lambda q, k, v: fused_attention(q, k, v, scale))(q, k, v)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_softmax_rows_sum_to_one_under_padding_mask(rng):
    """Output equals a convex combination of values (padding never leaks):
    with all-equal values the output must be exactly that value."""
    b, h, t, d = 1, 2, 77, 16
    q = jnp.asarray(rng.standard_normal((b, t, h * d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h * d)).astype(np.float32))
    v = jnp.ones((b, t, h * d), jnp.float32) * 3.5
    out = fused_attention_packed(q, k, v, h, 1.0 / np.sqrt(d))
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-5)
