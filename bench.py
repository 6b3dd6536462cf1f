"""Benchmark: voice-conversion synthesis throughput on one chip.

Measures the flagship inference path (prior encoder -> inverse flow ->
Multistream-iSTFT decoder, full-size QuickVC config) in audio-seconds
generated per wall-clock second per chip ("x realtime").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 50x realtime, the BASELINE.md north-star target
(the reference publishes no inference throughput numbers).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from quickvc_tpu.config import QuickVCConfig
from quickvc_tpu.models.synthesizer import SynthesizerTrn

BASELINE_XRT = 50.0


def main():
    cfg = QuickVCConfig()
    net = SynthesizerTrn(cfg.spec_channels, cfg.segment_frames, cfg.model)

    batch, frames = 8, 500  # 8 utterances x 10 s @ 50 Hz units
    rng = np.random.default_rng(0)
    unit = jnp.asarray(rng.standard_normal((batch, frames, cfg.model.unit_channels)).astype(np.float32))
    spec = jnp.zeros((1, 40, cfg.spec_channels), jnp.float32)
    mel = jnp.zeros((1, 40, cfg.data.n_mel_channels), jnp.float32)
    init_unit = jnp.zeros((1, 40, cfg.model.unit_channels), jnp.float32)
    variables = jax.jit(lambda: net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "slice": jax.random.PRNGKey(2)}, init_unit, spec, mel))()
    g_vec = jnp.asarray(rng.standard_normal((batch, cfg.model.gin_channels)).astype(np.float32))
    g_vec = g_vec / np.linalg.norm(g_vec, axis=1, keepdims=True)

    @jax.jit
    def infer(params, unit, g_vec):
        return net.apply({"params": params}, unit, g_vec, 0.0,
                         method=SynthesizerTrn.infer)

    params = variables["params"]
    # Warmup / compile
    out = infer(params, unit, g_vec)
    out.block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(params, unit, g_vec)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    audio_seconds = iters * batch * frames * cfg.data.hop_length / cfg.data.sampling_rate
    xrt = audio_seconds / dt
    print(json.dumps({
        "metric": "synthesis_throughput",
        "value": round(xrt, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(xrt / BASELINE_XRT, 3),
    }))


if __name__ == "__main__":
    main()
