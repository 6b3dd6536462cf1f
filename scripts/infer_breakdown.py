"""Inference time breakdown: encoder+flow vs decoder, and batch scaling.

Times each stage of the flagship inference path separately (with chained
serialized execution — see bench.py) to direct optimization effort.

    python scripts/infer_breakdown.py          # on TPU
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from quickvc_tpu.config import QuickVCConfig
from quickvc_tpu.models.synthesizer import SynthesizerTrn


def chained_time(fn, x, iters=20):
    @jax.jit
    def chained(u):
        def body(c, _):
            out = fn(u + c)
            return (jnp.mean(out) * 1e-12).astype(u.dtype), None
        c, _ = jax.lax.scan(body, jnp.zeros((), u.dtype), None, length=iters)
        return c

    v = chained(x)
    jax.block_until_ready(v)
    t0 = time.perf_counter()
    assert np.isfinite(float(chained(x)))
    return (time.perf_counter() - t0) / iters


def main():
    cfg = QuickVCConfig()
    net = SynthesizerTrn(cfg.spec_channels, cfg.segment_frames, cfg.model)
    rng = np.random.default_rng(0)
    frames = 500

    spec = jnp.zeros((1, 40, cfg.spec_channels), jnp.float32)
    mel = jnp.zeros((1, 40, 80), jnp.float32)
    iu = jnp.zeros((1, 40, 256), jnp.float32)
    variables = jax.jit(lambda: net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "slice": jax.random.PRNGKey(2)}, iu, spec, mel))()
    params = variables["params"]

    bound = net.bind(variables)
    report = {}
    for batch in (32, 64, 128):
        unit = jnp.asarray(rng.standard_normal((batch, frames, 256)).astype(np.float32))
        g_vec = jnp.zeros((batch, cfg.model.gin_channels), jnp.float32)
        z = jnp.asarray(rng.standard_normal((batch, frames, cfg.model.inter_channels)).astype(np.float32))

        def enc_flow(u):
            zp, _, _ = bound.enc_p(u, noise_scale=0.0)
            return bound.flow(zp, g_vec[:, None, :], reverse=True)

        def dec_only(zz):
            y, _ = bound.dec(zz, g_vec[:, None, :])
            return y

        def full(u):
            return net.apply({"params": params}, u, g_vec, 0.0,
                             method=SynthesizerTrn.infer)

        audio_s = batch * frames * cfg.data.hop_length / cfg.data.sampling_rate
        t_ef = chained_time(jax.jit(enc_flow), unit)
        t_d = chained_time(jax.jit(dec_only), z)
        t_full = chained_time(jax.jit(full), unit)
        report[batch] = {
            "enc_flow_ms": round(t_ef * 1e3, 2),
            "dec_ms": round(t_d * 1e3, 2),
            "full_ms": round(t_full * 1e3, 2),
            "xrt_full": round(audio_s / t_full, 1),
        }
        print(f"b={batch}: enc+flow {t_ef*1e3:.2f} ms, dec {t_d*1e3:.2f} ms, "
              f"full {t_full*1e3:.2f} ms -> {audio_s / t_full:.0f}x rt", file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
