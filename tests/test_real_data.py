"""Real-data smoke tests against the reference repo's shipped fixtures.

Uses the 19 wavs in /root/reference/test_data (16 kHz VCTK s16, 22.05 kHz
LJSpeech) and the float32 golden outputs in /root/reference/output/quickvc —
real-world files for the WAV readers, resampler, trim, and featurization.
Skipped when the reference tree isn't mounted.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


def test_vctk_wav_reads_and_features():
    from quickvc_tpu.data.audio_io import read_wav, trim_silence
    from quickvc_tpu.dsp.mel import mel_filterbank
    from quickvc_tpu.dsp.stft import wave_to_mel

    wav, sr = read_wav(f"{REF}/test_data/p225_001.wav")
    assert sr == 16000
    assert 0.5 < np.abs(wav).max() <= 1.0
    trimmed, (a, b) = trim_silence(wav, top_db=20)
    assert 0 < len(trimmed) <= len(wav)

    fb = jnp.asarray(mel_filterbank(16000, 1280, 80))
    n = (len(wav) // 320) * 320
    mel = wave_to_mel(jnp.asarray(wav[None, :n]), fb, 1280, 320, 1280)
    assert mel.shape == (1, n // 320, 80)
    assert np.isfinite(np.asarray(mel)).all()


def test_ljspeech_resample_path():
    from quickvc_tpu.data.audio_io import read_wav, resample

    wav, sr = read_wav(f"{REF}/test_data/LJ001-0001.wav")
    assert sr == 22050
    wav16 = resample(wav, sr, 16000)
    assert abs(len(wav16) - len(wav) * 16000 / 22050) <= 2
    assert np.isfinite(wav16).all()


def test_native_decoder_on_real_files():
    from quickvc_tpu.data import native

    if not native.available():
        pytest.skip("native lib not built")
    # s16 PCM (VCTK)
    x, sr = native.read_audio(f"{REF}/test_data/p226_005.wav")
    assert sr == 16000 and len(x) > 16000 and np.abs(x).max() <= 1.0
    # float32 golden output (written by the reference's convert.py)
    y, sr2 = native.read_audio(f"{REF}/output/quickvc/title5.wav")
    assert sr2 == 16000 and np.isfinite(y).all()

    # cross-check against scipy on the same files
    from quickvc_tpu.data.audio_io import read_wav

    xs, _ = read_wav(f"{REF}/test_data/p226_005.wav")
    np.testing.assert_allclose(x, xs, atol=1e-6)
    ys, _ = read_wav(f"{REF}/output/quickvc/title5.wav")
    np.testing.assert_allclose(y, ys, atol=1e-5)


def test_convert_txt_pairs_resolve():
    with open(f"{REF}/convert.txt") as f:
        pairs = [line.strip().split("|") for line in f if line.strip()]
    assert len(pairs) == 12
    for title, src, tgt in pairs:
        assert os.path.exists(os.path.join(REF, src))
        assert os.path.exists(os.path.join(REF, tgt))
        assert os.path.exists(os.path.join(REF, "output/quickvc", f"{title}.wav"))
