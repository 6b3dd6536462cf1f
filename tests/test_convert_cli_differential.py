"""CLI-level differential: the reference's OWN convert.py vs ours, shared weights.

The module-level parity suite (test_reference_parity.py) validates
``net_g.infer`` against reference code. This closes the remaining loop
(VERDICT r2 item 1): export a seeded generator to a reference-layout
``G.pth``, run ``/root/reference/convert.py`` on it (under the shims in
ref_convert_harness.py, with a torch HuBERT sharing weights with our flax
HuBERT), run our ``convert.py`` on the SAME files, and gate per-pair
mel-L1 < 1e-3. After this, only the literal pretrained weights remain
differentially untested (environment-blocked: no network).

Small-width generator (16ch, reference-hardcoded depths 16/4/4) keeps the
test fast; the HuBERT must be full-size (our CLI validates the bshall
state-dict contract). scripts/convert_cli_differential.py runs the same
machinery at full generator size over the reference's real convert.txt
pairs.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


def _write_config(path: str, list_path: str) -> "QuickVCConfig":
    from quickvc_tpu.config import DataConfig, ModelConfig, QuickVCConfig, TrainConfig

    cfg = QuickVCConfig(
        train=TrainConfig(),
        data=DataConfig(training_files=list_path, validation_files=list_path),
        # reference-compatible small widths; depths stay at the reference's
        # hardcoded 16/4/4 (models.py:582-584) so the SAME config drives both
        model=ModelConfig(inter_channels=16, hidden_channels=16,
                          upsample_initial_channel=32, gin_channels=16,
                          resblock_kernel_sizes=(3,),
                          resblock_dilation_sizes=((1, 3, 5),)),
    )
    cfg.save(path)
    return cfg


def mel_l1(a: np.ndarray, b: np.ndarray, cfg) -> float:
    import jax.numpy as jnp

    from quickvc_tpu.dsp.mel import mel_filterbank
    from quickvc_tpu.dsp.stft import wave_to_mel

    basis = jnp.asarray(mel_filterbank(cfg.data.sampling_rate,
                                       cfg.data.filter_length,
                                       cfg.data.n_mel_channels,
                                       cfg.data.mel_fmin, cfg.data.mel_fmax))
    n = min(len(a), len(b))
    ma = wave_to_mel(jnp.asarray(a[None, :n]), basis, cfg.data.filter_length,
                     cfg.data.hop_length, cfg.data.win_length)
    mb = wave_to_mel(jnp.asarray(b[None, :n]), basis, cfg.data.filter_length,
                     cfg.data.hop_length, cfg.data.win_length)
    return float(np.mean(np.abs(np.asarray(ma) - np.asarray(mb))))


def test_reference_convert_cli_vs_ours(tmp_path, rng):
    from ref_convert_harness import TorchHubertSoft, run_reference_convert
    from quickvc_tpu.data.audio_io import read_wav, write_wav_int16
    from quickvc_tpu.train.state import create_train_state
    from quickvc_tpu.utils.torch_export import (
        export_generator,
        save_reference_checkpoint,
    )

    # --- shared inputs: sources one length; targets straddle the 128-frame
    # speaker-window threshold (reference models.py:533-543 branches there) ---
    wavs = {}
    for name, seconds, f0 in [("src_a", 1.0, 220.0), ("src_b", 1.0, 330.0),
                              ("tgt_long", 3.0, 155.0), ("tgt_short", 1.5, 260.0)]:
        t = int(16000 * seconds)
        x = (0.3 * np.sin(2 * np.pi * f0 * np.arange(t) / 16000)
             + 0.03 * rng.standard_normal(t)).astype(np.float32)
        p = str(tmp_path / f"{name}.wav")
        write_wav_int16(p, x, 16000)
        wavs[name] = p
    txt = tmp_path / "convert.txt"
    txt.write_text(
        f"pair1|{wavs['src_a']}|{wavs['tgt_long']}\n"
        f"pair2|{wavs['src_b']}|{wavs['tgt_short']}\n"
        f"pair3|{wavs['src_b']}|{wavs['tgt_long']}\n")  # reused target: d-vec cache

    cfg_path = str(tmp_path / "config.json")
    cfg = _write_config(cfg_path, str(txt))

    # --- shared weights: seeded generator -> reference-layout .pth ---
    state, _, _ = create_train_state(cfg, jax.random.PRNGKey(11))
    g_pth = str(tmp_path / "G_test.pth")
    save_reference_checkpoint(
        g_pth, export_generator(state.g_params, cfg.model), 1, 2e-4)

    torch.manual_seed(5)
    hubert_t = TorchHubertSoft().eval()  # full-size random (contract-valid)
    hubert_pt = str(tmp_path / "hubert-soft.pt")
    torch.save({"hubert": hubert_t.state_dict()}, hubert_pt)

    # --- reference CLI ---
    out_ref = str(tmp_path / "out_ref")
    run_reference_convert(cfg_path, g_pth, str(txt), out_ref, hubert_t)

    # --- our CLI, same weights, deterministic, reference-style per-pair ---
    out_ours = str(tmp_path / "out_ours")
    import convert as our_convert

    argv = sys.argv
    sys.argv = ["convert.py", "--hpfile", cfg_path, "--ptfile", g_pth,
                "--hubert", hubert_pt, "--txtpath", str(txt),
                "--outdir", out_ours, "--noise-scale", "0",
                "--bucket-seconds", "0", "--batch", "1"]
    try:
        our_convert.main()
    finally:
        sys.argv = argv

    report = []
    for title in ("pair1", "pair2", "pair3"):
        ref_wav, sr_r = read_wav(os.path.join(out_ref, f"{title}.wav"))
        our_wav, sr_o = read_wav(os.path.join(out_ours, f"{title}.wav"))
        assert sr_r == sr_o == 16000
        assert abs(len(ref_wav) - len(our_wav)) <= 64, (len(ref_wav), len(our_wav))
        n = min(len(ref_wav), len(our_wav))
        w_l1 = float(np.abs(ref_wav[:n] - our_wav[:n]).mean())
        m_l1 = mel_l1(ref_wav, our_wav, cfg)
        report.append((title, w_l1, m_l1))
        assert m_l1 < 1e-3, f"{title}: mel_l1={m_l1} (wave_l1={w_l1})"
    # waveforms themselves should be near-identical too, not just mels
    assert max(r[1] for r in report) < 1e-3, report
