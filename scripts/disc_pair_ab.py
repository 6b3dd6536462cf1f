"""A/B the discriminator batch_pair flag at full-train-step level.

disc_forward_pair in isolation got SLOWER with batch_pair (7.8 -> 12.9 ms)
while the full step got faster — this isolates whether batch_pair is a net
win inside the real step (where the D backward dominates) or whether the
whole 136->119 ms came from the WaveNet unroll alone.

    nohup python scripts/disc_pair_ab.py > /tmp/disc_pair_ab.log 2>&1 &
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


def main():
    from quickvc_tpu.config import QuickVCConfig
    from quickvc_tpu.dsp.mel import mel_filterbank
    from quickvc_tpu.models.discriminators import MultiPeriodDiscriminator
    from quickvc_tpu.train.state import create_train_state
    from quickvc_tpu.train.step import make_train_step

    cfg = QuickVCConfig()
    cfg.train.precision = "bf16"
    b, f = 64, 512
    hop = cfg.data.hop_length

    rng = np.random.default_rng(0)
    batch = {
        "unit": jnp.asarray(rng.standard_normal((b, f, cfg.model.unit_channels)).astype(np.float32)),
        "spec": jnp.asarray(np.abs(rng.standard_normal((b, f, cfg.spec_channels))).astype(np.float32)),
        "wave": jnp.asarray(rng.standard_normal((b, f * hop, 1)).astype(np.float32) * 0.1),
    }
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr, flush=True)

    state, net_g, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    mel_basis = jnp.asarray(mel_filterbank(
        cfg.data.sampling_rate, cfg.data.filter_length, cfg.data.n_mel_channels,
        cfg.data.mel_fmin, cfg.data.mel_fmax))
    key = jax.random.PRNGKey(7)

    cdt = jnp.bfloat16
    y_seg = jnp.asarray(rng.standard_normal(
        (b, cfg.train.segment_size, 1)).astype(np.float32) * 0.1)
    y_fake = y_seg * 0.9 + 0.01

    for pair in (True, False):
        net_d = MultiPeriodDiscriminator(width=cfg.train.disc_width, batch_pair=pair)
        step_fn = make_train_step(cfg, net_g, net_d, mel_basis)

        def full(bt, st):
            return step_fn(st, bt, key)[0].g_params
        timeit(f"full_step_pair={pair}", full, batch, state)

        # D param grad alone
        def d_grad(yr, dp, yf):
            def loss(p):
                lr_, lg_, _, _ = net_d.apply({"params": p}, yr.astype(cdt), yf.astype(cdt))
                return sum(jnp.mean((l.astype(jnp.float32) - 1) ** 2) for l in lr_) + \
                    sum(jnp.mean(l.astype(jnp.float32) ** 2) for l in lg_)
            return jax.grad(loss)(dp)
        timeit(f"disc_grad_pair={pair}", d_grad, y_seg, state.d_params, y_fake)

        # G-phase shape: fwd + grad w.r.t. the FAKE INPUT (incl. fm loss)
        def d_input_grad(yf, dp, yr):
            def loss(yy):
                lr_, lg_, fr_, fg_ = net_d.apply({"params": dp}, yr.astype(cdt), yy.astype(cdt))
                fm = sum(jnp.mean(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32)))
                         for fa, fb in zip(fr_, fg_) for a, bb in zip(fa, fb))
                adv = sum(jnp.mean((l.astype(jnp.float32) - 1) ** 2) for l in lg_)
                return adv + fm
            return jax.grad(loss)(yf)
        timeit(f"disc_input_grad_pair={pair}", d_input_grad, y_fake, state.d_params, y_seg)


if __name__ == "__main__":
    main()
