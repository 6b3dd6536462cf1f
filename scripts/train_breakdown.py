"""Fine-grained timing of the GAN training step on TPU (batch 64 x 512 frames).

The roofline (scripts/roofline.py, BENCH.md) shows the train step at 24% of
FLOP peak and 31% of HBM peak — "latency/serial". This harness times each
component at training shapes to locate the serial time: the speaker-LSTM
scan, the WN encoder scans, the flow, the decoder on 32-frame slices, the
six discriminators (fwd and grad), the generator fwd / vjp pullback, the
two loss grads, and the optimizer updates.

Chained timing throughout (see bench.py:make_chained).

    nohup python scripts/train_breakdown.py > /tmp/train_breakdown.log 2>&1 &
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
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--frames", type=int, default=512)
    parser.add_argument("--precision", choices=["f32", "bf16"], default="bf16")
    args = parser.parse_args()

    from quickvc_tpu.config import QuickVCConfig
    from quickvc_tpu.dsp.mel import mel_filterbank
    from quickvc_tpu.dsp.stft import spec_to_mel, wave_to_mel
    from quickvc_tpu.train.state import create_train_state
    from quickvc_tpu.train.step import make_train_step
    from quickvc_tpu.ops.slicing import slice_segments

    cfg = QuickVCConfig()
    cfg.train.precision = args.precision
    cdt = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    b, f = args.batch, args.frames
    hop = cfg.data.hop_length

    rng = np.random.default_rng(0)
    batch = {
        "unit": jnp.asarray(rng.standard_normal((b, f, cfg.model.unit_channels)).astype(np.float32)),
        "spec": jnp.asarray(np.abs(rng.standard_normal((b, f, cfg.spec_channels))).astype(np.float32)),
        "wave": jnp.asarray(rng.standard_normal((b, f * hop, 1)).astype(np.float32) * 0.1),
    }
    print(f"device: {jax.devices()[0].device_kind}  batch {b} x {f} frames "
          f"({args.precision})", file=sys.stderr, flush=True)

    state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
    mel_basis = jnp.asarray(mel_filterbank(
        cfg.data.sampling_rate, cfg.data.filter_length, cfg.data.n_mel_channels,
        cfg.data.mel_fmin, cfg.data.mel_fmax))
    step_fn = make_train_step(cfg, net_g, net_d, mel_basis)

    key = jax.random.PRNGKey(7)

    # ---- full step ----
    def full(bt, st):
        return step_fn(st, bt, key)[0].g_params
    timeit("full_step", full, batch, state)

    mel = spec_to_mel(batch["spec"], mel_basis)
    rngs = {"sample": jax.random.PRNGKey(1), "slice": jax.random.PRNGKey(2)}

    def g_apply(gp, u, s, m):
        return net_g.apply({"params": gp}, u.astype(cdt), s.astype(cdt),
                           m.astype(cdt), rngs=rngs)

    # ---- generator forward ----
    def g_fwd(bt, gp):
        o, o_mb, ids, lat = g_apply(gp, bt["unit"], bt["spec"], mel)
        return o
    timeit("g_forward", g_fwd, batch, state.g_params)

    # ---- generator forward + full vjp pullback ----
    def g_fwd_bwd(bt, gp):
        def fn(p):
            o, o_mb, ids, lat = g_apply(p, bt["unit"], bt["spec"], mel)
            return o.astype(jnp.float32), tuple(t.astype(jnp.float32) for t in lat)
        (o, lat), vjp = jax.vjp(fn, gp)
        (grads,) = vjp((jnp.ones_like(o), tuple(jnp.ones_like(t) for t in lat)))
        return grads
    timeit("g_forward_plus_vjp", g_fwd_bwd, batch, state.g_params)

    # ---- per-module forwards at training shapes ----
    def spk(m, gp):
        return net_g.apply({"params": gp}, m.astype(cdt),
                           method="embed_speaker")
    timeit("enc_spk_lstm", spk, mel, state.g_params)

    def enc_p_fn(u, gp):
        return net_g.apply({"params": gp}, u.astype(cdt), rngs=rngs,
                           method=lambda n, x: n.enc_p(x))
    timeit("enc_p_wn16", enc_p_fn, batch["unit"], state.g_params)

    g_vec = np.asarray(spk(mel, state.g_params), np.float32)
    g_bc = jnp.asarray(g_vec)[:, None, :]

    def enc_q_fn(s, gp, g):
        return net_g.apply({"params": gp}, s.astype(cdt), g.astype(cdt),
                           rngs=rngs, method=lambda n, x, gg: n.enc_q(x, gg))
    timeit("enc_q_wn16", enc_q_fn, batch["spec"], state.g_params, g_bc)

    z = enc_q_fn(batch["spec"], state.g_params, g_bc)[0]

    def flow_fn(zz, gp, g):
        return net_g.apply({"params": gp}, zz.astype(cdt), g.astype(cdt),
                           method=lambda n, x, gg: n.flow(x, gg))
    timeit("flow_4x4", flow_fn, z, state.g_params, g_bc)

    z_slice = z[:, : cfg.segment_frames]

    def dec_fn(zz, gp, g):
        return net_g.apply({"params": gp}, zz.astype(cdt), g.astype(cdt),
                           method=lambda n, x, gg: n.dec(x, gg))[0]
    timeit("decoder_32f", dec_fn, z_slice, state.g_params, g_bc)

    # ---- per-module forward + vjp (w.r.t. params AND inputs) ----
    def bwd(name, fn, x, gp, *rest):
        def run(xx, p):
            def scalar(args):
                out = fn(args[0], args[1], *rest)
                leaves = [t for t in jax.tree.leaves(out)
                          if jnp.issubdtype(t.dtype, jnp.inexact)]
                return sum(jnp.sum(t.astype(jnp.float32)) for t in leaves)
            return jax.grad(scalar)((xx, p))
        timeit(name, run, x, gp)

    bwd("bwd_enc_spk_lstm", lambda m, gp: spk(m, gp), mel, state.g_params)
    bwd("bwd_enc_p_wn16", lambda u, gp: enc_p_fn(u, gp), batch["unit"], state.g_params)
    bwd("bwd_enc_q_wn16", lambda s, gp: enc_q_fn(s, gp, g_bc), batch["spec"], state.g_params)
    bwd("bwd_flow_4x4", lambda zz, gp: flow_fn(zz, gp, g_bc), z, state.g_params)
    bwd("bwd_decoder_32f", lambda zz, gp: dec_fn(zz, gp, g_bc), z_slice, state.g_params)

    # ---- discriminators ----
    y_seg = jnp.asarray(rng.standard_normal(
        (b, cfg.train.segment_size, 1)).astype(np.float32) * 0.1)
    y_fake = y_seg * 0.9 + 0.01

    def d_fwd(yr, dp, yf):
        return net_d.apply({"params": dp}, yr.astype(cdt), yf.astype(cdt))[0]
    timeit("disc_forward_pair", d_fwd, y_seg, state.d_params, y_fake)

    def d_grad(yr, dp, yf):
        def loss(p):
            lr_, lg_, _, _ = net_d.apply({"params": p}, yr.astype(cdt), yf.astype(cdt))
            return sum(jnp.mean((l.astype(jnp.float32) - 1) ** 2) for l in lr_) + \
                sum(jnp.mean(l.astype(jnp.float32) ** 2) for l in lg_)
        return jax.grad(loss)(dp)
    timeit("disc_grad", d_grad, y_seg, state.d_params, y_fake)

    # ---- loss featurization ----
    def melz(yy, mb):
        return wave_to_mel(yy[..., 0], mb, cfg.data.filter_length, hop,
                           cfg.data.win_length, method="matmul")
    timeit("wave_to_mel_seg", melz, y_seg, mel_basis)

    # ---- optimizer updates alone ----
    from quickvc_tpu.train.state import make_optimizer
    opt = make_optimizer(cfg)
    g_grads = jax.tree.map(lambda t: (t * 1e-6).astype(t.dtype), state.g_params)

    def opt_g(gr, ost, p):
        up, o2 = opt.update(gr, ost, p)
        import optax
        return optax.apply_updates(p, up)
    timeit("adamw_update_g", opt_g, g_grads, state.g_opt, state.g_params)

    d_grads = jax.tree.map(lambda t: (t * 1e-6).astype(t.dtype), state.d_params)

    def opt_d(gr, ost, p):
        up, o2 = opt.update(gr, ost, p)
        import optax
        return optax.apply_updates(p, up)
    timeit("adamw_update_d", opt_d, d_grads, state.d_opt, state.d_params)


if __name__ == "__main__":
    main()
