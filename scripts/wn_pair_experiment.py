"""Experiment: pair enc_p + enc_q WaveNet stacks via grouped convs?

The train step runs two independent 16-layer WaveNet scans back-to-back
(enc_p on units, enc_q on spec — fwd 6.4 + 6.5 ms, fwd+bwd ~30 ms at
batch 64 x 512 f, BENCH.md). Both stacks have identical shapes, so one
scan over grouped convs (feature_group_count=2, channels [p | q]) would
halve the serial chain length IF XLA lowers grouped convs at full MXU
efficiency — if it decomposes them into per-group convs, the gain is zero.

This measures exactly that, standalone (no model changes): sequential
two-stack vs grouped paired stack, fwd and fwd+grad, bf16, full train
shapes. Chained timing per BENCH.md.

    nohup python scripts/wn_pair_experiment.py > /tmp/wn_pair.log 2>&1 &
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from quickvc_tpu.utils.profiling import time_chained

B, T, H, L, K = 64, 512, 192, 16, 5
DN = ("NHC", "HIO", "NHC")


def conv(x, w, groups=1):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), [((K - 1) // 2 if w.shape[0] > 1 else 0,) * 2],
        dimension_numbers=DN, feature_group_count=groups)


def wn_single(params, x, g_stack):
    """Reference-shaped WN16: in(k5, h->2h) -> gate -> res_skip(1x1, h->2h)."""

    def layer(carry, p):
        x, out = carry
        w_in, w_rs, g_l = p
        x_in = conv(x, w_in) + g_l
        acts = jnp.tanh(x_in[..., :H]) * jax.nn.sigmoid(x_in[..., H:])
        rs = conv(acts, w_rs)
        return (x + rs[..., :H], out + rs[..., H:]), None

    (x, out), _ = jax.lax.scan(layer, (x, jnp.zeros_like(x)),
                               (params["in"], params["rs"], g_stack), unroll=L)
    return out


def wn_paired(params, xp, xq, g_stack_q):
    """One scan over both stacks: grouped convs, channels [p | q]."""
    x = jnp.concatenate([xp, xq], axis=-1)  # (B, T, 2H)

    def layer(carry, p):
        x, out = carry
        w_in, w_rs, g_l = p                  # w_in (K, H, 4H) grouped 2
        x_in = conv(x, w_in, groups=2) + g_l  # (B, T, 4H): [p2h | q2h]
        tanh_in = jnp.concatenate([x_in[..., :H], x_in[..., 2 * H:3 * H]], -1)
        sig_in = jnp.concatenate([x_in[..., H:2 * H], x_in[..., 3 * H:]], -1)
        acts = jnp.tanh(tanh_in) * jax.nn.sigmoid(sig_in)   # (B, T, 2H)
        rs = conv(acts, w_rs, groups=2)       # (B, T, 4H)
        res = jnp.concatenate([rs[..., :H], rs[..., 2 * H:3 * H]], -1)
        skip = jnp.concatenate([rs[..., H:2 * H], rs[..., 3 * H:]], -1)
        return (x + res, out + skip), None

    (x, out), _ = jax.lax.scan(layer, (x, jnp.zeros_like(x)),
                               (params["in"], params["rs"], g_stack_q), unroll=L)
    return out


def main():
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
    dtype = jnp.bfloat16

    p_single = {"in": f32(L, K, H, 2 * H), "rs": f32(L, 1, H, 2 * H)}
    q_single = {"in": f32(L, K, H, 2 * H), "rs": f32(L, 1, H, 2 * H)}
    paired = {"in": jnp.concatenate([p_single["in"], q_single["in"]], -1),
              "rs": jnp.concatenate([p_single["rs"], q_single["rs"]], -1)}

    xp, xq = f32(B, T, H), f32(B, T, H)
    gq = f32(L, B, 1, 2 * H)          # q-side conditioning, broadcast over T
    g0 = jnp.zeros((L, 1, 1, 2 * H))  # p side unconditioned
    g_paired = jnp.concatenate(
        [jnp.broadcast_to(g0, (L, B, 1, 2 * H)), gq], axis=-1)

    def seq_fwd(carry, pp, qp, xp, xq, gq):
        op = wn_single(pp, (xp + carry).astype(dtype), g0.astype(dtype))
        oq = wn_single(qp, (xq + carry).astype(dtype), gq.astype(dtype))
        return op + oq

    def pair_fwd(carry, pr, xp, xq, gq):
        return wn_paired(pr, (xp + carry).astype(dtype), (xq + carry).astype(dtype),
                         gq.astype(dtype))

    # numerical agreement first (f32): paired == sequential
    op = wn_single(jax.tree.map(lambda v: v, p_single), xp, jnp.broadcast_to(g0, (L, B, 1, 2 * H)))
    oq = wn_single(q_single, xq, gq)
    both = wn_paired(paired, xp, xq, jnp.concatenate(
        [jnp.broadcast_to(g0, (L, B, 1, 2 * H)), gq], -1))
    err = float(jnp.abs(jnp.concatenate([op, oq], -1) - both).max())
    print(f"paired-vs-sequential max abs err (f32): {err:.2e}", flush=True)
    assert err < 1e-4

    iters = 50
    dt = time_chained(functools.partial(seq_fwd), iters, p_single, q_single, xp, xq, gq)
    print(f"fwd sequential : {dt / iters * 1e3:7.2f} ms", flush=True)
    dt = time_chained(functools.partial(pair_fwd), iters, paired, xp, xq, g_paired)
    print(f"fwd paired     : {dt / iters * 1e3:7.2f} ms", flush=True)

    def seq_loss(pp, qp, xp, xq, gq):
        op = wn_single(pp, xp.astype(dtype), g0.astype(dtype))
        oq = wn_single(qp, xq.astype(dtype), gq.astype(dtype))
        return jnp.sum((op + oq).astype(jnp.float32) ** 2)

    def pair_loss(pr, xp, xq, gq):
        o = wn_paired(pr, xp.astype(dtype), xq.astype(dtype), gq.astype(dtype))
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def seq_grad(carry, pp, qp, xp, xq, gq):
        g = jax.grad(seq_loss)(pp, qp, xp + carry, xq + carry, gq)
        return g["in"]

    def pair_grad(carry, pr, xp, xq, gq):
        g = jax.grad(pair_loss)(pr, xp + carry, xq + carry, gq)
        return g["in"]

    iters = 30
    dt = time_chained(seq_grad, iters, p_single, q_single, xp, xq, gq)
    print(f"fwd+grad sequential : {dt / iters * 1e3:7.2f} ms", flush=True)
    dt = time_chained(pair_grad, iters, paired, xp, xq, g_paired)
    print(f"fwd+grad paired     : {dt / iters * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
