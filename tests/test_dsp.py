"""Golden-vector tests for the DSP core against torch.stft / torch.istft.

The torch ops here reproduce the exact featurization semantics of the
reference (mel_processing.py, losses.py, torchaudio InverseSpectrogram) so
any JAX/torch mismatch is a real parity bug.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from quickvc_tpu.dsp import (
    PQMFBank,
    hann_window,
    inverse_stft,
    magnitude_stft,
    mel_filterbank,
    spec_to_mel,
    wave_to_mel,
    wave_to_spec,
)


def torch_wave_to_spec(y: np.ndarray, n_fft: int, hop: int, win: int) -> np.ndarray:
    """Reference semantics of mel_processing.wave_to_spec, via torch (B, Freq, Frame)."""
    yt = torch.from_numpy(y)
    pad = (n_fft - hop) // 2
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    z = torch.stft(yt, n_fft, hop_length=hop, win_length=win, window=torch.hann_window(win),
                   center=False, pad_mode="reflect", normalized=False, onesided=True,
                   return_complex=True)
    return torch.sqrt(z.real**2 + z.imag**2 + 1e-6).numpy()


class TestWaveToSpec:
    @pytest.mark.parametrize("t", [10240, 16000, 163840])
    def test_matches_torch(self, rng, t):
        y = rng.standard_normal((2, t)).astype(np.float32) * 0.5
        ours = np.asarray(wave_to_spec(jnp.asarray(y), 1280, 320, 1280))
        golden = torch_wave_to_spec(y, 1280, 320, 1280)
        assert ours.shape == (2, t // 320, 641)
        np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=2e-4, rtol=2e-4)

    def test_matmul_method_matches_fft(self, rng):
        y = rng.standard_normal((1, 10240)).astype(np.float32)
        a = np.asarray(wave_to_spec(jnp.asarray(y), 1280, 320, 1280, method="fft"))
        b = np.asarray(wave_to_spec(jnp.asarray(y), 1280, 320, 1280, method="matmul"))
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


class TestMel:
    def test_filterbank_properties(self):
        fb = mel_filterbank(16000, 1280, 80, 0.0, None)
        assert fb.shape == (80, 641)
        assert fb.min() >= 0.0
        # Every interior filter has support; peaks decrease with Slaney norm.
        assert (fb.sum(axis=1) > 0).all()
        # Slaney normalization: in the log region filter widths grow, so
        # peaks shrink overall (allow small discrete-bin jitter per step).
        peaks = fb.max(axis=1)
        assert (np.diff(peaks[40:]) <= 2e-3).all()
        assert peaks[79] < peaks[40] * 0.5

    def test_wave_to_mel_shapes_and_range(self, rng):
        fb = jnp.asarray(mel_filterbank(16000, 1280, 80))
        y = rng.standard_normal((2, 10240)).astype(np.float32) * 0.3
        mel = np.asarray(wave_to_mel(jnp.asarray(y), fb, 1280, 320, 1280))
        assert mel.shape == (2, 32, 80)
        assert mel.min() >= np.log(1e-5) - 1e-6

    def test_spec_to_mel_matches_torch_matmul(self, rng):
        fb = mel_filterbank(16000, 1280, 80)
        spec = np.abs(rng.standard_normal((2, 32, 641))).astype(np.float32)
        ours = np.asarray(spec_to_mel(jnp.asarray(spec), jnp.asarray(fb)))
        golden = torch.log(torch.clamp(
            torch.matmul(torch.from_numpy(fb), torch.from_numpy(spec.transpose(0, 2, 1))), min=1e-5)).numpy()
        np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=1e-5, rtol=1e-5)


class TestMagnitudeSTFT:
    @pytest.mark.parametrize("cfg", [(384, 30, 150), (683, 60, 300), (171, 10, 60)])
    def test_matches_torchaudio_spectrogram(self, rng, cfg):
        n_fft, hop, win = cfg
        y = rng.standard_normal((3, 10240)).astype(np.float32)
        ours = np.asarray(magnitude_stft(jnp.asarray(y), n_fft, hop, win))
        z = torch.stft(torch.from_numpy(y), n_fft, hop_length=hop, win_length=win,
                       window=torch.hann_window(win), center=True, pad_mode="reflect",
                       normalized=False, onesided=True, return_complex=True)
        golden = z.abs().numpy()
        assert ours.shape == (golden.shape[0], golden.shape[2], golden.shape[1])
        np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=3e-4, rtol=3e-4)


class TestInverseSTFT:
    def test_matches_torch_istft(self, rng):
        n_fft, hop, frames = 16, 4, 641
        re = rng.standard_normal((5, frames, 9)).astype(np.float32)
        im = rng.standard_normal((5, frames, 9)).astype(np.float32)
        im[..., 0] = 0.0
        im[..., -1] = 0.0
        ours = np.asarray(inverse_stft(jnp.asarray(re), jnp.asarray(im), n_fft, hop))
        z = torch.complex(torch.from_numpy(re), torch.from_numpy(im)).transpose(1, 2)
        golden = torch.istft(z, n_fft, hop_length=hop, win_length=n_fft,
                             window=torch.hann_window(n_fft), center=True, onesided=True).numpy()
        assert ours.shape == golden.shape == (5, (frames - 1) * hop)
        np.testing.assert_allclose(ours, golden, atol=1e-5, rtol=1e-4)

    def test_roundtrip(self, rng):
        """stft -> istft identity on the interior (COLA with hann, hop=n_fft/4)."""
        n_fft, hop = 16, 4
        y = rng.standard_normal((1, 2000)).astype(np.float32)
        yt = torch.from_numpy(y)
        z = torch.stft(yt, n_fft, hop_length=hop, win_length=n_fft, window=torch.hann_window(n_fft),
                       center=True, return_complex=True)
        re, im = z.real.transpose(1, 2).numpy(), z.imag.transpose(1, 2).numpy()
        rec = np.asarray(inverse_stft(jnp.asarray(re), jnp.asarray(im), n_fft, hop))
        np.testing.assert_allclose(rec[0, : y.shape[1]], y[0], atol=1e-4, rtol=1e-4)


class TestPQMF:
    def _torch_pqmf(self):
        """Reference PQMF semantics rebuilt with torch convs (pqmf.py:96-117)."""
        bank = PQMFBank()
        h_a = np.asarray(bank.analysis_kernel)[:, 0, :].T  # (4, 63)
        h_s = np.asarray(bank.synthesis_kernel)[:, :, 0].T  # (1, 4, 63) after index
        return h_a, np.asarray(bank.synthesis_kernel)[:, :, 0]

    def test_analysis_matches_torch(self, rng):
        bank = PQMFBank()
        x = rng.standard_normal((2, 1, 1280)).astype(np.float32)
        ours = np.asarray(bank.analysis(jnp.asarray(x.transpose(0, 2, 1))))
        h_a = torch.from_numpy(np.asarray(bank.analysis_kernel)[:, 0, :].T.copy()).unsqueeze(1)
        xt = torch.nn.functional.pad(torch.from_numpy(x), (31, 31))
        full = torch.nn.functional.conv1d(xt, h_a)
        golden = full[:, :, ::4].numpy()
        np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=1e-5, rtol=1e-5)

    def test_synthesis_matches_torch(self, rng):
        bank = PQMFBank()
        x = rng.standard_normal((2, 4, 320)).astype(np.float32)
        ours = np.asarray(bank.synthesis(jnp.asarray(x.transpose(0, 2, 1))))
        # torch reference: conv_transpose with identity updown filter * subbands, then pad+conv
        updown = torch.zeros(4, 4, 4)
        for k in range(4):
            updown[k, k, 0] = 1.0
        xt = torch.nn.functional.conv_transpose1d(torch.from_numpy(x), updown * 4, stride=4)
        h_s = torch.from_numpy(np.asarray(bank.synthesis_kernel)[:, :, 0].T.copy()).unsqueeze(0)
        golden = torch.nn.functional.conv1d(torch.nn.functional.pad(xt, (31, 31)), h_s).numpy()
        assert ours.shape == (2, 1280, 1)
        np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=1e-5, rtol=1e-5)

    def test_reconstruction_properties(self, rng):
        """Analysis -> synthesis: 1-sample delay, unit gain, bounded aliasing.

        With the symmetric pad-31 convolutions the net filterbank delay is 1
        sample. Pseudo-QMF only *approximately* cancels adjacent-band
        aliasing, so white noise (worst case: full-band energy) reconstructs
        with a small residual; a low-frequency tone is near-exact in gain.
        """
        bank = PQMFBank()
        t = 4096
        x = rng.standard_normal((1, t, 1)).astype(np.float32) * 0.5
        rec = np.asarray(bank.synthesis(bank.analysis(jnp.asarray(x))))[0, :, 0]
        xr = x[0, :, 0]
        err = rec[1:][200:3500] - xr[:-1][200:3500]
        rel = np.sqrt((err**2).mean()) / np.sqrt((xr**2).mean())
        assert rel < 0.2
        # tone: unit gain through the bank
        tone = np.sin(2 * np.pi * 0.05 * np.arange(t)).astype(np.float32)[None, :, None]
        rec_t = np.asarray(bank.synthesis(bank.analysis(jnp.asarray(tone))))[0, :, 0]
        assert abs(rec_t[200:3500].std() / tone[0, 200:3500, 0].std() - 1.0) < 0.01


def test_hann_matches_torch():
    # torch computes the window in f32; ours is f64 rounded to f32 -> 1-ulp diffs
    np.testing.assert_allclose(hann_window(1280), torch.hann_window(1280).numpy(), atol=1e-6)
    np.testing.assert_allclose(hann_window(16), torch.hann_window(16).numpy(), atol=1e-6)


def test_numpy_spec_cache_matches_jax(rng):
    """The loader's numpy spec (dataset._compute_spec) == the jitted wave_to_spec."""
    from quickvc_tpu.config import QuickVCConfig
    from quickvc_tpu.data.dataset import _compute_spec

    cfg = QuickVCConfig()
    y = rng.standard_normal(16000).astype(np.float32) * 0.4
    a = _compute_spec(y, cfg)
    b = np.asarray(wave_to_spec(jnp.asarray(y[None]), 1280, 320, 1280))[0]
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=3e-4, rtol=3e-4)
