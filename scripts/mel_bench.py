"""Featurization benchmark: XLA fft vs XLA matmul-DFT vs Pallas fused mel.

    python scripts/mel_bench.py     # on TPU
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

from quickvc_tpu.dsp.mel import mel_filterbank
from quickvc_tpu.dsp.stft import wave_to_mel
from quickvc_tpu.ops.fused_mel import wave_to_mel_pallas


def chained_time(fn, x, iters=30):
    @jax.jit
    def chained(u):
        def body(c, _):
            out = fn(u + c)
            return (jnp.mean(out) * 1e-12).astype(u.dtype), None
        c, _ = jax.lax.scan(body, jnp.zeros((), u.dtype), None, length=iters)
        return c

    jax.block_until_ready(chained(x))
    t0 = time.perf_counter()
    assert np.isfinite(float(chained(x)))
    return (time.perf_counter() - t0) / iters


def main():
    b, t = 32, 160000  # 32 x 10 s
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * 0.3)
    fb = jnp.asarray(mel_filterbank(16000, 1280, 80))
    audio_s = b * t / 16000

    cases = {
        "xla_fft": lambda u: wave_to_mel(u, fb, 1280, 320, 1280, method="fft"),
        "xla_matmul": lambda u: wave_to_mel(u, fb, 1280, 320, 1280, method="matmul"),
        "pallas_fused": lambda u: wave_to_mel_pallas(u, 16000, 1280, 320, 1280, 80),
    }
    out = {}
    for name, fn in cases.items():
        try:
            dt = chained_time(fn, y)
            out[name] = {"ms": round(dt * 1e3, 3), "xrt": round(audio_s / dt, 0)}
            print(f"{name}: {dt*1e3:.2f} ms ({audio_s/dt:.0f}x rt)", file=sys.stderr)
        except Exception as e:
            print(f"{name} failed: {type(e).__name__}: {e}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
