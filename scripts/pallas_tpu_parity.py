"""On-TPU numeric parity gate for every Pallas path (VERDICT r4 item 2).

All Pallas correctness tests in tests/test_pallas.py run in interpret mode
on CPU, and interpret mode provably does not model real Mosaic: the bf16
sublane-rotate bug in ops/fused_disc_conv.py was found only on hardware
(CLAUDE.md Mosaic lessons). Meanwhile wave_to_spec_halo_pallas computes the
TRAINING spectrogram in compact mode (train/step.py) and wave_to_mel_fast
feeds eval + convert d-vectors — a silent on-device numeric regression in
these kernels would pass the entire CPU suite.

This script runs each kernel against its XLA reference (f32 HIGHEST-
precision matmuls, dsp/stft.py) ON THE REAL CHIP at production shapes, with
explicit allclose gates, and writes ``PALLAS_TPU_r{N}.json`` at the repo
root. Run once per round under the default (TPU) environment:

    nohup python scripts/pallas_tpu_parity.py --round 5 > /tmp/pallas_parity.log 2>&1 &

Shipped-on gates (failures exit non-zero):
  - spec_halo          the compact-mode training spectrogram (b64 x 512 f)
  - mel_fast           eval/convert featurization, 1 x 10 s + batched
  - attention_packed   HuBERT MHA, f32 and bf16, incl. a non-128-multiple T
  - extractor_faststats  the default HuBERT extractor front

Off-by-default paths are gated too (regressions there matter when the knob
is flipped) but reported as shipped=false: the fused iSTFT head, the whole
fused transformer layer, the pallas extractor front, and the disc conv
fwd+VJP (the kernel with the bf16 hardware-only bug history).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)

RESULTS: list[dict] = []


def gate(name: str, ours, golden, atol: float, rtol: float, *,
         shipped: bool, note: str = "") -> None:
    a = np.asarray(ours, np.float64)
    g = np.asarray(golden, np.float64)
    assert a.shape == g.shape, (name, a.shape, g.shape)
    err = np.abs(a - g)
    margin = err - (atol + rtol * np.abs(g))
    ok = bool((margin <= 0).all())
    rec = {
        "name": name,
        "shape": list(a.shape),
        "shipped": shipped,
        "atol": atol,
        "rtol": rtol,
        "mean_abs_err": float(err.mean()),
        "max_abs_err": float(err.max()),
        "max_rel_err": float((err / np.maximum(np.abs(g), 1e-6)).max()),
        "frac_violating": float((margin > 0).mean()),
        "pass": ok,
        "note": note,
    }
    RESULTS.append(rec)
    print(f"[{'PASS' if ok else 'FAIL'}] {name:34s} shape={tuple(a.shape)} "
          f"max_abs={rec['max_abs_err']:.3e} max_rel={rec['max_rel_err']:.3e} "
          f"(atol={atol:g} rtol={rtol:g})", flush=True)


def crash(name: str, e: BaseException, *, shipped: bool) -> None:
    """A gate that fails to compile/execute is a FAILING gate, recorded in
    the artifact (it must not lose the other gates' results — a Mosaic
    lowering error on one kernel is exactly the bug class this hunts)."""
    RESULTS.append({
        "name": name, "shipped": shipped, "pass": False,
        "crash": f"{type(e).__name__}: {str(e)[:400]}",
    })
    print(f"[FAIL] {name:34s} CRASH {type(e).__name__}: {str(e)[:160]}",
          flush=True)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--round", type=int, required=True)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    t0 = time.time()
    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()})", flush=True)
    if backend != "tpu":
        print("ERROR: this gate must run on the real TPU (default env); "
              "interpret-mode parity already runs in the suite.")
        return 2

    from quickvc_tpu.dsp.istft import polar_inverse_stft
    from quickvc_tpu.dsp.mel import mel_filterbank
    from quickvc_tpu.dsp.stft import wave_to_mel, wave_to_spec_halo
    from quickvc_tpu.models.hubert import FeatureExtractor, TransformerLayer
    from quickvc_tpu.ops.fused_attention import fused_attention_packed
    from quickvc_tpu.ops.fused_disc_conv import (conv5_lrelu,
                                                 conv5_lrelu_reference)
    from quickvc_tpu.ops.fused_istft import polar_inverse_stft_pallas
    from quickvc_tpu.ops.fused_mel import (wave_to_mel_pallas,
                                           wave_to_spec_halo_pallas)
    from quickvc_tpu.ops.fused_transformer import fused_transformer_layer

    rng = np.random.default_rng(0)
    n_fft, hop, win = 1280, 320, 1280
    pad = (n_fft - hop) // 2

    # --- 1. Training spectrogram (compact transfer), b64 x 512 frames ----
    # The single highest-risk kernel: every production training step's spec.
    y_halo = (rng.standard_normal((64, 512 * hop + 2 * pad))
              .astype(np.float32) * 0.3)
    ours = jax.jit(lambda y: wave_to_spec_halo_pallas(y, n_fft, hop, win))(
        jnp.asarray(y_halo))
    gold = jax.jit(lambda y: wave_to_spec_halo(y, n_fft, hop, win))(
        jnp.asarray(y_halo))
    gate("spec_halo_b64x512f", ours, gold, 2e-4, 2e-4, shipped=True,
         note="training spec, train/step.py compact path")

    # s16-quantized wave (the actual wire format) as a second draw
    y_q = np.round(y_halo[:8] * 32767).astype(np.int16).astype(np.float32) / 32768.0
    ours = jax.jit(lambda y: wave_to_spec_halo_pallas(y, n_fft, hop, win))(
        jnp.asarray(y_q))
    gold = jax.jit(lambda y: wave_to_spec_halo(y, n_fft, hop, win))(
        jnp.asarray(y_q))
    gate("spec_halo_s16_wire", ours, gold, 2e-4, 2e-4, shipped=True)

    # --- 2. Eval/convert featurization: wave_to_mel_fast's TPU kernel ----
    fb = jnp.asarray(mel_filterbank(16000, n_fft, 80))
    for nm, (b, t) in (("mel_1x10s", (1, 163840)),
                       ("mel_batched", (4, 81920)),
                       ("mel_nonmultiple", (1, 160123))):
        try:
            y = rng.standard_normal((b, t)).astype(np.float32) * 0.4
            ours = jax.jit(lambda y: wave_to_mel_pallas(
                y, 16000, n_fft, hop, win, 80))(jnp.asarray(y))
            gold = jax.jit(lambda y: wave_to_mel(y, fb, n_fft, hop, win))(
                jnp.asarray(y))
            n = min(ours.shape[1], gold.shape[1])
            gate(nm, ours[:, :n], gold[:, :n], 2e-3, 2e-3, shipped=True,
                 note="eval + convert.py d-vector featurization")
        except Exception as e:  # noqa: BLE001
            crash(nm, e, shipped=True)

    # --- 3. HuBERT fused attention (packed layout), f32 + bf16 ----------
    # The kernel keeps true-f32 multiplicands for f32 inputs (HIGHEST; the
    # convert CLI serves HuBERT in f32) and single-pass bf16 for bf16 (the
    # production bench dtype) — so the reference einsum mirrors that:
    # HIGHEST for f32, DEFAULT for bf16.
    def einsum_attn(q, k, v, h, scale):
        b, t, hd_all = q.shape
        d = hd_all // h
        prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                else None)
        def heads(z):
            return z.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", heads(q), heads(k),
                       precision=prec).astype(jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, heads(v), precision=prec)
        return o.transpose(0, 2, 1, 3).reshape(b, t, hd_all)

    scale = 1.0 / np.sqrt(64.0)
    for nm, b, t, dt, atol, rtol in (
            ("attention_f32_1x501", 1, 501, jnp.float32, 1e-4, 1e-3),
            ("attention_f32_8x512", 8, 512, jnp.float32, 1e-4, 1e-3),
            ("attention_bf16_8x501", 8, 501, jnp.bfloat16, 2e-2, 2e-2)):
        try:
            q, k, v = (jnp.asarray(rng.standard_normal((b, t, 768))
                                   .astype(np.float32)).astype(dt)
                       for _ in range(3))
            ours = jax.jit(lambda q, k, v: fused_attention_packed(
                q, k, v, num_heads=12, scale=scale))(q, k, v)
            gold = jax.jit(lambda q, k, v: einsum_attn(
                q, k, v, 12, scale))(q, k, v)
            gate(nm, np.asarray(ours, np.float32),
                 np.asarray(gold, np.float32), atol, rtol, shipped=True,
                 note="HuBERT MHA (models/hubert.py), packed Pallas kernel")
        except Exception as e:  # noqa: BLE001
            crash(nm, e, shipped=True)

    # --- 4. Extractor fronts: faststats (default) + pallas vs xla -------
    fe_x = FeatureExtractor(front_mode="xla")
    p_fe = fe_x.init(jax.random.PRNGKey(0), jnp.zeros((1, 2000, 1)))
    xw = jnp.asarray(rng.standard_normal((2, 160000, 1)).astype(np.float32) * 0.3)
    gold = jax.jit(fe_x.apply)(p_fe, xw)
    for mode, shipped in (("faststats", True), ("pallas", False)):
        try:
            fe_m = FeatureExtractor(front_mode=mode)
            ours = jax.jit(fe_m.apply)(p_fe, xw)
            gate(f"extractor_{mode}_2x10s", ours, gold, 5e-4, 1e-3,
                 shipped=shipped,
                 note="default --hubert-front" if shipped else "opt-in front")
        except Exception as e:  # noqa: BLE001
            crash(f"extractor_{mode}_2x10s", e, shipped=shipped)

    # --- 5. Fused iSTFT decoder head (off by default) --------------------
    for nm, (b, f) in (("istft_head_train_seg", (256, 161)),
                       ("istft_head_infer_10s", (8, 2501))):
        try:
            log_mag = rng.standard_normal((b, f, 9)).astype(np.float32) * 0.5
            phase = rng.standard_normal((b, f, 9)).astype(np.float32)
            ours = jax.jit(lambda m, p: polar_inverse_stft_pallas(
                m, p, 16, 4))(jnp.asarray(log_mag), jnp.asarray(phase))
            gold = jax.jit(lambda m, p: polar_inverse_stft(m, p, 16, 4))(
                jnp.asarray(log_mag), jnp.asarray(phase))
            gate(nm, ours, gold, 1e-4, 1e-3, shipped=False,
                 note="model.use_pallas_istft decoder head")
        except Exception as e:  # noqa: BLE001
            crash(nm, e, shipped=False)

    # --- 6. Fused transformer layer (off by default) ---------------------
    try:
        tl = TransformerLayer()
        p_tl = tl.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 768)))["params"]
        x = jnp.asarray(rng.standard_normal((2, 512, 768)).astype(np.float32) * 0.5)
        ours = jax.jit(lambda x: fused_transformer_layer(x, p_tl, 12))(x)
        # golden at HIGHEST to match the kernel's f32 rule (flax Dense has
        # no per-layer precision knob; the context manager sets it)
        with jax.default_matmul_precision("highest"):
            gold = jax.jit(lambda x: tl.apply({"params": p_tl}, x))(x)
        gate("transformer_layer_2x512", ours, gold, 1e-4, 1e-3, shipped=False,
             note="use_pallas_layer whole-layer kernel")
    except Exception as e:  # noqa: BLE001
        crash("transformer_layer_2x512", e, shipped=False)

    # --- 7. Disc conv fwd + VJP (bf16-hardware-bug history) --------------
    n, rows, c_in, c_out = 2, 512, 256, 256
    x = jnp.asarray(rng.standard_normal((n, rows, c_in)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((5, c_in, c_out)).astype(np.float32) * 0.05)
    bb = jnp.asarray(rng.standard_normal((c_out,)).astype(np.float32) * 0.1)
    try:
        ours = jax.jit(lambda x, k, b: conv5_lrelu(x, k, b, 0.1))(x, k, bb)
        # f32 golden at HIGHEST (the kernel keeps f32 multiplicands;
        # XLA's conv at DEFAULT would itself be the bf16-rounded side)
        with jax.default_matmul_precision("highest"):
            gold = jax.jit(lambda x, k, b: conv5_lrelu_reference(
                x, k, b, 0.1))(x, k, bb)
        gate("disc_conv5_fwd_f32", ours, gold, 1e-4, 1e-3, shipped=False,
             note="fused_disc_conv (documented negative perf result)")

        xb, kb = x.astype(jnp.bfloat16), k.astype(jnp.bfloat16)
        ours = jax.jit(lambda x, k, b: conv5_lrelu(x, k, b, 0.1))(xb, kb, bb)
        gold = jax.jit(lambda x, k, b: conv5_lrelu_reference(x, k, b, 0.1))(xb, kb, bb)
        gate("disc_conv5_fwd_bf16", np.asarray(ours, np.float32),
             np.asarray(gold, np.float32), 5e-2, 5e-2, shipped=False,
             note="the dtype whose sublane-rotate bug was TPU-only")

        dy = jnp.asarray(rng.standard_normal((n, rows, c_out)).astype(np.float32))
        g_ours = jax.jit(jax.grad(
            lambda x, k, b: jnp.sum(conv5_lrelu(x, k, b, 0.1) * dy),
            argnums=(0, 1, 2)))(x, k, bb)
        with jax.default_matmul_precision("highest"):
            g_gold = jax.jit(jax.grad(
                lambda x, k, b: jnp.sum(conv5_lrelu_reference(x, k, b, 0.1) * dy),
                argnums=(0, 1, 2)))(x, k, bb)
        for a, g, leaf in zip(g_ours, g_gold, ("dx", "dw", "db")):
            gate(f"disc_conv5_vjp_{leaf}_f32", a, g, 5e-4, 1e-3, shipped=False)
    except Exception as e:  # noqa: BLE001
        crash("disc_conv5", e, shipped=False)

    # --- report ----------------------------------------------------------
    shipped_fail = [r["name"] for r in RESULTS if r["shipped"] and not r["pass"]]
    optin_fail = [r["name"] for r in RESULTS if not r["shipped"] and not r["pass"]]
    out = {
        "round": args.round,
        "backend": backend,
        "device": str(jax.devices()[0]),
        "elapsed_s": round(time.time() - t0, 1),
        "n_gates": len(RESULTS),
        "shipped_failures": shipped_fail,
        "optin_failures": optin_fail,
        "ok": not shipped_fail and not optin_fail,
        "gates": RESULTS,
    }
    path = os.path.join(REPO, f"PALLAS_TPU_r{args.round:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {path}: {len(RESULTS)} gates, "
          f"shipped failures: {shipped_fail or 'none'}, "
          f"opt-in failures: {optin_fail or 'none'} "
          f"({out['elapsed_s']} s)", flush=True)
    return 1 if shipped_fail else 0


if __name__ == "__main__":
    sys.exit(main())
