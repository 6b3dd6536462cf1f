"""Wavefront-scheduled 3-layer LSTM: 3x fewer serial scan iterations.

The speaker encoder's 3x256 LSTM over 512 frames costs 3.3 ms fwd / 14 ms
fwd+bwd at batch 64 — latency-bound on 3*512 serial scan steps (unrolling
doesn't help, scripts/bwd_experiments.py). Wavefront schedule: in scan
iteration k, layer l processes timestep k-l; the three cell updates are
independent within an iteration so their matmuls and gate nonlinearities
batch along a leading layer axis (one (3,B,512)@(3,512,1024) einsum, one
gate chain on (3,B,1024)). Serial length drops 3*T -> T+2 with EXACT
numerics (each layer sees exactly the same inputs as the sequential
schedule, delayed one iteration per layer).

This harness checks exactness vs the plain per-layer scan and times both.

    nohup python scripts/lstm_wavefront.py > /tmp/lstm_wavefront.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=10):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(jax.tree.map(lambda t: t + carry.astype(t.dtype), a[0]), *a[1:])
            leaves = [x for x in jax.tree.leaves(out)
                      if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)]
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
            return (s * 1e-12).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
        return c

    out = chained(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        v = float(chained(*args))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(v), name
    print(f"{name}: {best / iters * 1e3:.3f} ms", flush=True)
    return best / iters


H = 256
L = 3


def make_params(rng, in_ch):
    ps = {}
    for l in range(L):
        ic = in_ch if l == 0 else H
        ps[f"w_ih_l{l}"] = rng.standard_normal((4 * H, ic)).astype(np.float32) * 0.05
        ps[f"w_hh_l{l}"] = rng.standard_normal((4 * H, H)).astype(np.float32) * 0.05
        ps[f"b_l{l}"] = rng.standard_normal((4 * H,)).astype(np.float32) * 0.05
    return jax.tree.map(jnp.asarray, ps)


def cell(gates, c):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c = f * c + i * g
    return o * jnp.tanh(c), c


def lstm_sequential(params, x):
    bsz = x.shape[0]
    for l in range(L):
        xp = x @ params[f"w_ih_l{l}"].T.astype(x.dtype) + params[f"b_l{l}"].astype(x.dtype)

        def step(carry, g_in, l=l):
            h, c = carry
            h, c = cell(g_in + h @ params[f"w_hh_l{l}"].T.astype(h.dtype), c)
            return (h, c), h

        carry0 = (jnp.zeros((bsz, H), x.dtype), jnp.zeros((bsz, H), x.dtype))
        (hf, _), hs = jax.lax.scan(step, carry0, xp.swapaxes(0, 1))
        x = hs.swapaxes(0, 1)
    return hf


def lstm_wavefront(params, x):
    """Exact wavefront: serial length T + L - 1."""
    bsz, t, _ = x.shape
    dt = x.dtype
    # Layer-0 input projections for all timesteps: one big MXU matmul.
    xp0 = x @ params["w_ih_l0"].T.astype(dt) + params["b_l0"].astype(dt)  # (B,T,4H)
    # Stacked recurrent weights (3,H,4H); layer>=1 input weights (2,H,4H).
    w_hh = jnp.stack([params[f"w_hh_l{l}"].T for l in range(L)]).astype(dt)
    w_ih = jnp.stack([params[f"w_ih_l{l}"].T for l in range(1, L)]).astype(dt)
    b = jnp.stack([params[f"b_l{l}"] for l in range(1, L)]).astype(dt)  # (2,4H)

    # Pad the layer-0 projections with L-1 trailing zero iterations; invalid
    # slots are masked so h/c stay frozen there (a zero gate input would
    # still evolve the state).
    pad = jnp.zeros((L - 1, bsz, 4 * H), dt)
    xp_seq = jnp.concatenate([xp0.swapaxes(0, 1), pad], axis=0)  # (T+2,B,4H)
    steps = t + L - 1
    # valid[k, l]: layer l active at iteration k  (l <= k < t + l)
    ks = np.arange(steps)[:, None]
    ls = np.arange(L)[None, :]
    valid = jnp.asarray((ks >= ls) & (ks < t + ls))  # (T+2, L) bool

    def step(carry, inp):
        h, c, h_prev = carry          # h,c: (L,B,H); h_prev: (L-1,B,H) = h of layer l-1 from last iter
        xp_k, valid_k = inp           # (B,4H), (L,)
        # gates for all layers in ONE batched einsum over the layer axis:
        #   layer 0:   xp_k (precomputed)      + h[0] @ w_hh[0]
        #   layer l>0: h_prev[l-1] @ w_ih[l-1] + h[l] @ w_hh[l] + b[l-1]
        g_in = jnp.concatenate([
            xp_k[None], jnp.einsum("lbh,lhg->lbg", h_prev, w_ih) + b[:, None, :]], axis=0)
        gates = g_in + jnp.einsum("lbh,lhg->lbg", h, w_hh)      # (L,B,4H)
        h_new, c_new = cell(gates, c)
        m = valid_k[:, None, None]
        h2 = jnp.where(m, h_new, h)
        c2 = jnp.where(m, c_new, c)
        return (h2, c2, h2[:-1]), h2[-1]

    h0 = jnp.zeros((L, bsz, H), dt)
    (hf, _, _), _ = jax.lax.scan(
        step, (h0, h0, h0[:-1]), (xp_seq, valid))
    return hf[-1]


def main():
    rng = np.random.default_rng(0)
    params = make_params(rng, 80)
    x = jnp.asarray(rng.standard_normal((64, 512, 80)).astype(np.float32))
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr, flush=True)

    # exactness (f32)
    a = jax.jit(lstm_sequential)(params, x)
    bb = jax.jit(lstm_wavefront)(params, x)
    err = float(jnp.max(jnp.abs(a - bb)))
    print(f"max |seq - wavefront| (f32): {err:.3e}", flush=True)
    assert err < 1e-5, "wavefront is not exact"

    xb = x.astype(jnp.bfloat16)
    pb = jax.tree.map(lambda t: t.astype(jnp.bfloat16), params)

    def grad_of(fn):
        def run(xx, p):
            def scalar(args):
                return jnp.sum(fn(args[1], args[0]).astype(jnp.float32))
            return jax.grad(scalar)((xx, p))
        return run

    timeit("seq_fwd", lambda xx, p: lstm_sequential(p, xx), xb, pb)
    timeit("seq_fwdbwd", grad_of(lstm_sequential), xb, pb)
    timeit("wave_fwd", lambda xx, p: lstm_wavefront(p, xx), xb, pb)
    timeit("wave_fwdbwd", grad_of(lstm_wavefront), xb, pb)


if __name__ == "__main__":
    main()
