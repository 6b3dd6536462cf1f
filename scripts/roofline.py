"""Roofline/utilization report: measured vs speed-of-light on this chip.

For each hot path (synthesis inference, HuBERT content encoding, the full
GAN training step) this compiles the jitted function, reads XLA's own cost
model (``compiled.cost_analysis()``: flops + HBM bytes accessed) and the
compiled memory footprint, measures wall time with chained timing (see
bench.py:make_chained — the carry is folded into an *input* so XLA cannot
hoist the body out of the loop), and reports achieved TFLOP/s and HBM GB/s
against the chip's peaks — how close each path runs to its roofline bound.

Peaks default to TPU v5e (v5 lite): 197 bf16 TFLOP/s, 819 GB/s HBM.

    nohup python scripts/roofline.py > /tmp/roofline.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

PEAKS = {
    # device_kind fragment -> (bf16 TFLOP/s, HBM GB/s)
    "v5 lite": (197.0, 819.0),
    "v5e": (197.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v4": (275.0, 1228.0),
    "cpu": (1.0, 100.0),  # placeholder so the script runs anywhere
}


def chip_peaks() -> tuple[float, float]:
    kind = jax.devices()[0].device_kind.lower()
    for frag, peaks in PEAKS.items():
        if frag in kind:
            return peaks
    return PEAKS["v5e"]


def measure(name, fn_carry, args, iters, results, peak_tflops, peak_gbs):
    """fn_carry(carry_scalar, *args) -> scalar. Compile for cost analysis,
    then time a chained scan whose carry feeds the next iteration's input."""
    zero = jnp.zeros((), jnp.float32)
    compiled = jax.jit(fn_carry).lower(zero, *args).compile()
    cost = compiled.cost_analysis()
    mem = compiled.memory_analysis()
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))

    @jax.jit
    def chained(*a):
        def body(carry, _):
            return (fn_carry(carry, *a) * 1e-12).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, zero, None, length=iters)
        return c

    out = chained(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        v = float(chained(*args))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(v)
    dt = best / iters

    r = {
        "wall_ms": round(dt * 1e3, 3),
        "gflops": round(flops / 1e9, 2),
        "achieved_tflops": round(flops / dt / 1e12, 2),
        "pct_of_peak_flops": round(100 * flops / dt / 1e12 / peak_tflops, 1),
        "hbm_gb": round(byts / 1e9, 3),
        "achieved_gbs": round(byts / dt / 1e9, 1),
        "pct_of_peak_bw": round(100 * byts / dt / 1e9 / peak_gbs, 1),
        "temp_mb": round(mem.temp_size_in_bytes / 1e6, 1),
        "bound": "compute" if (flops / peak_tflops / 1e12) > (byts / peak_gbs / 1e9)
                 else "bandwidth",
    }
    results[name] = r
    print(f"{name}: {r['wall_ms']:.2f} ms | {r['achieved_tflops']:.1f} TFLOP/s "
          f"({r['pct_of_peak_flops']:.0f}% peak) | {r['achieved_gbs']:.0f} GB/s "
          f"({r['pct_of_peak_bw']:.0f}% peak) | {r['bound']}-bound | "
          f"temp {r['temp_mb']:.0f} MB", file=sys.stderr)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    from quickvc_tpu.config import QuickVCConfig
    from quickvc_tpu.dsp.mel import mel_filterbank
    from quickvc_tpu.models.hubert import HubertSoft
    from quickvc_tpu.models.synthesizer import SynthesizerTrn
    from quickvc_tpu.train import create_train_state, make_train_step

    peak_tflops, peak_gbs = chip_peaks()
    print(f"device: {jax.devices()[0].device_kind} | peaks {peak_tflops} bf16 "
          f"TFLOP/s, {peak_gbs} GB/s", file=sys.stderr)

    cfg = QuickVCConfig()
    cfg.train.precision = "bf16"
    rng = np.random.default_rng(0)
    results: dict[str, dict] = {}

    # -- synthesis inference, batch 32 x 10 s, bf16 --
    net = SynthesizerTrn(cfg.spec_channels, cfg.segment_frames, cfg.model)
    iu = jnp.zeros((1, 40, 256), jnp.float32)
    variables = jax.jit(lambda: net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "slice": jax.random.PRNGKey(2)}, iu,
        jnp.zeros((1, 40, cfg.spec_channels), jnp.float32),
        jnp.zeros((1, 40, 80), jnp.float32)))()
    g_params = variables["params"]
    unit = jnp.asarray(rng.standard_normal((32, 500, 256)).astype(np.float32)).astype(jnp.bfloat16)
    g_vec = jnp.asarray(rng.standard_normal((32, 256)).astype(np.float32)).astype(jnp.bfloat16)

    def infer_c(carry, p, u, g):
        out = net.apply({"params": p}, u + carry.astype(u.dtype), g, 0.0,
                        method=SynthesizerTrn.infer)
        return jnp.sum(out.astype(jnp.float32))

    measure("synthesis_b32_10s_bf16", infer_c, (g_params, unit, g_vec),
            args.iters, results, peak_tflops, peak_gbs)

    # -- HuBERT content encoding, batch 32 x 10 s, bf16 --
    hubert = HubertSoft()
    h_params = jax.jit(lambda: hubert.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16000), jnp.float32)))()
    wav = jnp.asarray(rng.standard_normal((32, 160000)).astype(np.float32) * 0.1).astype(jnp.bfloat16)

    def units_c(carry, p, w):
        u = hubert.apply(p, w + carry.astype(w.dtype), method=HubertSoft.units)
        return jnp.sum(u.astype(jnp.float32))

    measure("hubert_b32_10s_bf16", units_c, (h_params, wav),
            args.iters, results, peak_tflops, peak_gbs)

    # -- full GAN training step, batch 64 x 512 frames, bf16 --
    state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
    basis = jnp.asarray(mel_filterbank(cfg.data.sampling_rate, cfg.data.filter_length,
                                       cfg.data.n_mel_channels))
    step = make_train_step(cfg, net_g, net_d, basis)
    b, frames = 64, 512
    batch = {
        "unit": jnp.asarray(rng.standard_normal((b, frames, 256)).astype(np.float32)),
        "spec": jnp.asarray(np.abs(rng.standard_normal((b, frames, cfg.spec_channels))).astype(np.float32)),
        "wave": jnp.asarray(rng.standard_normal((b, frames * cfg.data.hop_length, 1)).astype(np.float32) * 0.1),
    }

    # The train step must thread STATE through the scan carry and fold the
    # key per iteration — perturbing only `unit` leaves the posterior path,
    # decoder, and D update loop-invariant (unit only feeds the prior
    # encoder) and XLA hoists most of the step out of the loop, silently
    # measuring a fraction of it.
    key = jax.random.PRNGKey(1)
    compiled = jax.jit(step).lower(state, batch, key).compile()
    cost, mem = compiled.cost_analysis(), compiled.memory_analysis()

    @jax.jit
    def run_steps(st, bt):
        def body(s, i):
            s2, m = step(s, bt, jax.random.fold_in(key, i))
            return s2, m["loss/g/total"]

        _, losses = jax.lax.scan(body, st, jnp.arange(args.iters))
        return losses[-1]

    out = run_steps(state, batch)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        v = float(run_steps(state, batch))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(v)
    dt = best / args.iters
    flops, byts = float(cost.get("flops", 0.0)), float(cost.get("bytes accessed", 0.0))
    results["train_step_b64_bf16"] = {
        "wall_ms": round(dt * 1e3, 3),
        "gflops": round(flops / 1e9, 2),
        "achieved_tflops": round(flops / dt / 1e12, 2),
        "pct_of_peak_flops": round(100 * flops / dt / 1e12 / peak_tflops, 1),
        "hbm_gb": round(byts / 1e9, 3),
        "achieved_gbs": round(byts / dt / 1e9, 1),
        "pct_of_peak_bw": round(100 * byts / dt / 1e9 / peak_gbs, 1),
        "temp_mb": round(mem.temp_size_in_bytes / 1e6, 1),
    }
    r = results["train_step_b64_bf16"]
    print(f"train_step_b64_bf16: {r['wall_ms']:.2f} ms | "
          f"{r['achieved_tflops']:.1f} TFLOP/s ({r['pct_of_peak_flops']:.0f}% peak) | "
          f"{r['achieved_gbs']:.0f} GB/s ({r['pct_of_peak_bw']:.0f}% peak) | "
          f"temp {r['temp_mb']:.0f} MB", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
