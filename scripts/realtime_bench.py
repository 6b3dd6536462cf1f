"""Live-conversion latency benchmark: per-chunk step time on one chip.

Measures the jitted step of ``quickvc_tpu.infer.realtime`` sessions at
full model size (bf16): the synthesis-only step (unit-domain sessions) and
the wave-in/wave-out step with the 94M-param HuBERT-soft front inside the
same XLA program. For each (batch=N concurrent streams, chunk, lookahead)
point it reports:

- ``step_ms``      — compute per tick (chained timing, BENCH.md rules),
- ``rtf``          — step time / chunk duration (<1 means real-time),
- ``latency_ms``   — mouth-to-ear: chunk buffering + lookahead + compute.

A point is "real-time" when step_ms < chunk duration; the largest such N
is the concurrent-live-streams capacity of the chip at that latency.

    nohup python scripts/realtime_bench.py > /tmp/realtime_bench.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

FRAME_MS = 20.0  # hop 320 @ 16 kHz


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--precision", choices=["f32", "bf16"], default="bf16")
    args = parser.parse_args()

    from quickvc_tpu.config import QuickVCConfig
    from quickvc_tpu.models.hubert import HubertSoft
    from quickvc_tpu.models.synthesizer import SynthesizerTrn
    from quickvc_tpu.utils.profiling import time_chained

    cfg = QuickVCConfig()
    hop = cfg.data.hop_length
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32

    hubert = HubertSoft(front_mode="faststats")
    net = SynthesizerTrn(cfg.spec_channels, cfg.segment_frames, cfg.model)

    print("initializing params (jitted)...", file=sys.stderr)
    h_params = jax.jit(lambda: hubert.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16000), jnp.float32)))()
    variables = jax.jit(lambda: net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "slice": jax.random.PRNGKey(2)},
        jnp.zeros((1, 40, 256), jnp.float32),
        jnp.zeros((1, 40, cfg.spec_channels), jnp.float32),
        jnp.zeros((1, 40, 80), jnp.float32)))()
    g_params = variables["params"]

    # The session steps, as pure fns (params explicit — closing over the
    # 94M-param pytree bakes literals into the HLO, e2e_bench.py note).
    def synth_step(gp, units, g, left, chunk):
        wave = net.apply({"params": gp}, units.astype(dtype), g.astype(dtype),
                         0.0, method=SynthesizerTrn.infer)
        return jax.lax.dynamic_slice_in_dim(
            wave[..., 0], left * hop, chunk * hop, axis=1)

    def wave_step(hp, gp, wavein, g, left, chunk):
        units = hubert.apply(hp, wavein.astype(dtype),
                             method=HubertSoft.units).astype(jnp.float32)
        return synth_step(gp, units, g, left, chunk)

    rng = np.random.default_rng(0)

    def run_case(domain, batch, chunk, left, right):
        window = left + chunk + right
        g = rng.standard_normal((batch, cfg.model.gin_channels)).astype(np.float32)
        g = jnp.asarray(g / np.linalg.norm(g, axis=1, keepdims=True))
        if domain == "units":
            win = jnp.asarray(rng.standard_normal(
                (batch, window, 256)).astype(np.float32))
            fn = lambda carry, gp, u, gv: synth_step(gp, u + carry, gv, left, chunk)
            dt = time_chained(fn, args.iters, g_params, win, g)
        else:
            win = jnp.asarray(rng.standard_normal(
                (batch, window * hop)).astype(np.float32) * 0.1)
            fn = lambda carry, hp, gp, w, gv: wave_step(
                hp, gp, w + carry, gv, left, chunk)
            dt = time_chained(fn, args.iters, h_params, g_params, win, g)
        step_ms = dt / args.iters * 1e3
        chunk_ms = chunk * FRAME_MS
        rec = {
            "domain": domain, "streams": batch, "chunk_ms": chunk_ms,
            "lookahead_ms": right * FRAME_MS, "window_frames": window,
            "step_ms": round(step_ms, 2),
            "rtf": round(step_ms / chunk_ms, 4),
            "latency_ms": round(chunk_ms + right * FRAME_MS + step_ms, 1),
            "realtime": step_ms < chunk_ms,
        }
        print(json.dumps(rec), flush=True)
        return rec

    # chunk 16 f = 320 ms ticks, 960 ms past + 320 ms lookahead context
    for batch in (1, 8, 64, 256, 512):
        run_case("units", batch, chunk=16, left=48, right=16)
    for batch in (1, 8, 64, 256):
        run_case("wave", batch, chunk=16, left=48, right=16)
    # low-latency point: 80 ms ticks, 80 ms lookahead
    for batch in (1, 64):
        run_case("units", batch, chunk=4, left=60, right=4)
        run_case("wave", batch, chunk=4, left=60, right=4)


if __name__ == "__main__":
    main()
