"""Golden regression harness vs the reference's published conversions.

The reference repo ships a de-facto regression suite (SURVEY.md §4): 19
wavs under ``test_data/``, 12 pairs in ``convert.txt``, and the expected
float32 outputs under ``output/quickvc/title{1..12}.wav`` produced by the
1.2M-step pretrained checkpoint.

This script runs those pairs through quickvc_tpu (porting the pretrained
torch checkpoint + HuBERT-soft weights) and reports per-pair waveform L1
and log-mel L1 against the reference outputs. North star (BASELINE.md):
mel-L1 < 1e-3.

Requires the pretrained artifacts locally (not fetchable in zero-egress
environments):
    --ptfile  quickvc.pth        (reference G checkpoint)
    --hubert  hubert-soft.pt     (bshall/hubert HuBERT-soft)

Note: inference samples the prior (reference models.py:638, eps*exp(logs));
for a deterministic comparison we run with --noise-scale 0 AND also report
mel-L1 which is robust to the small prior noise.

Golden-stability note (ADVICE r2): this harness deliberately runs ONE pair
per forward (the convert.py --batch 1 equivalent) so its mel-L1 numbers
stay comparable across framework versions — convert.py's default --batch 8
shifts numerics by ~3e-5 rel (batched reductions + different rng split
structure) which is irrelevant for audio but visible to golden diffs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference-root", default="/root/reference")
    parser.add_argument("--hpfile", default="logs/quickvc/config.json")
    parser.add_argument("--ptfile", default="logs/quickvc/quickvc.pth")
    parser.add_argument("--hubert", default="logs/hubert-soft.pt")
    parser.add_argument("--noise-scale", type=float, default=0.0)
    parser.add_argument("--out", default="regression_report.json")
    parser.add_argument("--limit", type=int, default=None,
                        help="run only the first N pairs (CPU smoke runs; "
                             "each distinct utterance length recompiles)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from quickvc_tpu.config import load_config
    from quickvc_tpu.data.audio_io import read_wav, resample, trim_silence
    from quickvc_tpu.dsp.mel import mel_filterbank
    from quickvc_tpu.dsp.stft import wave_to_mel
    from quickvc_tpu.models.encoders import embed_utterance_batch
    from quickvc_tpu.models.hubert import HubertSoft
    from quickvc_tpu.models.synthesizer import SynthesizerTrn
    from convert import load_generator_params, load_hubert_params

    ref = args.reference_root
    cfg_path = args.hpfile if os.path.exists(args.hpfile) else os.path.join(ref, "logs/quickvc/config.json")
    cfg = load_config(cfg_path)
    sr = cfg.data.sampling_rate

    net_g = SynthesizerTrn(cfg.spec_channels, cfg.segment_frames, cfg.model)
    g_params = load_generator_params(args.ptfile, cfg)
    hubert = HubertSoft()
    h_vars = load_hubert_params(args.hubert)
    basis = jnp.asarray(mel_filterbank(sr, cfg.data.filter_length, cfg.data.n_mel_channels,
                                       cfg.data.mel_fmin, cfg.data.mel_fmax))

    units_fn = jax.jit(lambda w: hubert.apply(h_vars, w, method=HubertSoft.units))
    infer_fn = jax.jit(lambda u, g: net_g.apply(
        {"params": g_params}, u, g, args.noise_scale, method=SynthesizerTrn.infer))
    embed_fn = jax.jit(lambda p, m: net_g.apply(
        {"params": p}, m, method=SynthesizerTrn.embed_speaker))

    with open(os.path.join(ref, "convert.txt")) as f:
        pairs = [line.strip().split("|") for line in f if line.strip()]
    if args.limit:
        pairs = pairs[: args.limit]

    report = []
    for title, src, tgt in pairs:
        wav_tgt, tsr = read_wav(os.path.join(ref, tgt))
        wav_tgt = resample(wav_tgt, tsr, sr)
        wav_tgt, _ = trim_silence(wav_tgt, top_db=20)
        wav_src, ssr = read_wav(os.path.join(ref, src))
        wav_src = resample(wav_src, ssr, sr)

        mel_tgt = wave_to_mel(jnp.asarray(wav_tgt[None]), basis, cfg.data.filter_length,
                              cfg.data.hop_length, cfg.data.win_length)
        g_vec = embed_utterance_batch(embed_fn, g_params, mel_tgt)
        unit = units_fn(jnp.asarray(wav_src[None]))
        audio = np.asarray(infer_fn(unit, g_vec))[0, :, 0]

        golden, gsr = read_wav(os.path.join(ref, "output/quickvc", f"{title}.wav"))
        assert gsr == sr
        n = min(len(audio), len(golden))
        wave_l1 = float(np.abs(audio[:n] - golden[:n]).mean())
        mel_a = np.asarray(wave_to_mel(jnp.asarray(audio[None, :n]), basis,
                                       cfg.data.filter_length, cfg.data.hop_length,
                                       cfg.data.win_length))
        mel_g = np.asarray(wave_to_mel(jnp.asarray(golden[None, :n]), basis,
                                       cfg.data.filter_length, cfg.data.hop_length,
                                       cfg.data.win_length))
        mel_l1 = float(np.abs(mel_a - mel_g).mean())
        report.append({"title": title, "wave_l1": wave_l1, "mel_l1": mel_l1,
                       "len_ours": len(audio), "len_ref": len(golden)})
        print(f"{title}: wave_l1={wave_l1:.5f} mel_l1={mel_l1:.5f}")

    summary = {"pairs": report,
               "mel_l1_mean": float(np.mean([r["mel_l1"] for r in report])),
               "wave_l1_mean": float(np.mean([r["wave_l1"] for r in report]))}
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "pairs"}))


if __name__ == "__main__":
    main()
