"""Data-parallel scaling benchmark: step time vs mesh size.

Measures the jitted GAN training step at data-parallel widths 1..N on the
available devices (real chips, or virtual CPU devices via
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``)
with a fixed per-device batch (weak scaling). Reports step time and
scaling efficiency vs the 1-device baseline — the harness for the
BASELINE.md ">=90% efficiency 1 -> 2 hosts" target once multi-host
hardware is available.

    python scripts/scaling_bench.py [--per-device-batch 8] [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--per-device-batch", type=int, default=8)
    parser.add_argument("--frames", type=int, default=40)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--small", action="store_true",
                        help="reduced model depths (CPU-friendly)")
    parser.add_argument("--precision", choices=["f32", "bf16"], default="f32")
    parser.add_argument("--no-guard", action="store_true",
                        help="disable the non-finite update guard (A/B its cost)")
    parser.add_argument("--split-prior", action="store_true",
                        help="enc_p in its own vjp after the D update "
                             "(train.split_prior A/B)")
    parser.add_argument("--lr", type=float, default=None,
                        help="override learning rate (timing is "
                             "lr-independent; small values keep the GAN "
                             "finite on random benchmark inputs)")
    parser.add_argument("--transfer", choices=["full", "compact"],
                        default="full",
                        help="batch wire format (train.transfer): compact "
                             "= s16 wave + halo, on-device spec — A/B the "
                             "device-side cost of the in-step STFT")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from quickvc_tpu.config import QuickVCConfig
    from quickvc_tpu.dsp.mel import mel_filterbank
    from quickvc_tpu.parallel import batch_sharding, data_parallel_mesh, replicated
    from quickvc_tpu.train import create_train_state, make_train_step

    cfg = QuickVCConfig()
    cfg.train.precision = args.precision
    if args.no_guard:
        cfg.train.guard_nonfinite = False
    if args.split_prior:
        cfg.train.split_prior = True
    cfg.train.transfer = args.transfer
    if args.lr is not None:
        cfg.train.learning_rate = args.lr
    if args.small:
        cfg.train.segment_size = 2560
        cfg.train.disc_width = 0.25
        cfg.model.enc_wn_layers = 4
        cfg.model.flow_wn_layers = 2
        cfg.model.n_flows = 2
        cfg.model.upsample_initial_channel = 128
        cfg.model.resblock_kernel_sizes = (3,)
        cfg.model.resblock_dilation_sizes = ((1, 3, 5),)

    n_dev = jax.device_count()
    state0, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
    basis = jnp.asarray(mel_filterbank(cfg.data.sampling_rate, cfg.data.filter_length,
                                       cfg.data.n_mel_channels))
    rng = np.random.default_rng(0)

    widths = [w for w in (1, 2, 4, 8, 16) if w <= n_dev]
    results = {}
    base = None
    for w in widths:
        mesh = data_parallel_mesh(w)
        rep, bsh = replicated(mesh), batch_sharding(mesh)
        b = args.per_device_batch * w
        if args.transfer == "compact":
            pad = (cfg.data.filter_length - cfg.data.hop_length) // 2
            n = args.frames * cfg.data.hop_length + 2 * pad
            batch = {
                "unit": jnp.asarray(rng.standard_normal(
                    (b, args.frames, cfg.model.unit_channels)).astype(np.float32)),
                "wave_s16": jnp.asarray((rng.standard_normal((b, n)) * 3000)
                                        .astype(np.int16)),
                "n_take": jnp.full((b,), args.frames, jnp.int32),
            }
        else:
            batch = {
                "unit": jnp.asarray(rng.standard_normal((b, args.frames, cfg.model.unit_channels)).astype(np.float32)),
                "spec": jnp.asarray(np.abs(rng.standard_normal((b, args.frames, cfg.spec_channels))).astype(np.float32)),
                "wave": jnp.asarray(rng.standard_normal((b, args.frames * cfg.data.hop_length, 1)).astype(np.float32) * 0.1),
            }
        state = jax.device_put(state0, rep)
        batch = jax.device_put(batch, bsh)
        step = make_train_step(cfg, net_g, net_d, basis)
        key = jax.random.PRNGKey(1)

        # ONE jitted lax.scan over the step sequence, state threaded through
        # the carry: exactly real training's data dependency, ONE dispatch.
        # A python loop of step() calls pays the remote tunnel's per-call
        # dispatch latency (~80 ms/call here) and over-reports step time
        # >2x; see also bench.py:make_chained.
        @jax.jit
        def run_steps(st, bt):
            def body(s, i):
                s2, m = step(s, bt, jax.random.fold_in(key, i))
                return s2, m["loss/g/total"]

            s, losses = jax.lax.scan(body, st, jnp.arange(args.iters))
            return losses[-1]

        with mesh:
            out = run_steps(state, batch)  # compile + warmup
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                val = float(run_steps(state, batch))
                best = min(best, time.perf_counter() - t0)
                assert np.isfinite(val)
        dt = best / args.iters
        eff = (base / dt) if base is not None else 1.0
        if base is None:
            base = dt
        results[w] = {"step_s": round(dt, 4), "weak_scaling_eff": round(eff, 3),
                      "global_batch": b}
        print(f"dp={w}: {dt*1e3:.1f} ms/step, weak-scaling eff {eff:.2%}",
              file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
