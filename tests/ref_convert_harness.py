"""Run the REFERENCE's own convert.py (/root/reference/convert.py) offline.

This is the machinery behind the CLI-level differential gate (VERDICT r2
item 1): export our weights to a reference-layout ``G.pth``, run the
reference's unmodified convert.py on it under environment shims, run OUR
convert.py on the same files, and compare outputs. That validates the whole
pipeline — convert.txt parsing, load/trim/resample, mel + speaker windowing,
HuBERT units, infer, wav write — against reference *code*, leaving only the
literal pretrained weights untested (blocked: no network).

Shims (the reference imports things this image lacks; same approach as
tests/test_reference_parity.py:34-79):

- ``librosa``            -> load/effects.trim/filters.mel backed by our host
                            DSP (quickvc_tpu.data.audio_io / dsp.mel). Both
                            CLIs therefore share the host resample/trim
                            primitives — those cannot be differentially
                            validated against real librosa offline, but
                            everything downstream of them is.
- ``torchaudio``         -> InverseSpectrogram via torch.istft.
- ``scipy.signal.kaiser``-> np.kaiser (removed in modern scipy).
- ``torch.hub.load``     -> a local torch HuBERT-soft (bshall layout) loaded
                            from the given checkpoint — the same weights our
                            flax HuBERT runs.
- ``.cuda()``            -> no-op (Module and Tensor).
- ``torch.randn_like``   -> zeros, so the reference's prior sample is the
                            mean, matching our ``--noise-scale 0``.
"""

from __future__ import annotations

import importlib.machinery
import runpy
import sys
import types

import numpy as np
import torch


REF = "/root/reference"


def install_static_shims() -> None:
    """Install the import-time shims (idempotent; shared with the parity tests)."""
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        ta_tf = types.ModuleType("torchaudio.transforms")
        ta.__spec__ = importlib.machinery.ModuleSpec("torchaudio", None)
        ta_tf.__spec__ = importlib.machinery.ModuleSpec("torchaudio.transforms", None)

        class InverseSpectrogram(torch.nn.Module):
            def __init__(self, n_fft, win_length=None, hop_length=None):
                super().__init__()
                self.n_fft = n_fft
                self.win_length = win_length or n_fft
                self.hop_length = hop_length or self.win_length // 2
                self.register_buffer("window", torch.hann_window(self.win_length))

            def forward(self, spec, length=None):
                return torch.istft(spec, self.n_fft, hop_length=self.hop_length,
                                   win_length=self.win_length, window=self.window,
                                   center=True, normalized=False, onesided=True,
                                   length=length)

        class Spectrogram(torch.nn.Module):
            # reference losses.py:98 uses Spectrogram(fft, win, hop,
            # power=1.0) — torchaudio's positional order (n_fft,
            # win_length, hop_length); center-padded magnitude STFT
            def __init__(self, n_fft, win_length=None, hop_length=None,
                         power=1.0):
                super().__init__()
                self.n_fft = n_fft
                self.win_length = win_length or n_fft
                self.hop_length = hop_length or self.win_length // 2
                self.power = power
                self.register_buffer("window", torch.hann_window(self.win_length))

            def forward(self, x):
                z = torch.stft(x, self.n_fft, hop_length=self.hop_length,
                               win_length=self.win_length, window=self.window,
                               center=True, normalized=False, onesided=True,
                               return_complex=True)
                mag = z.abs()
                return mag if self.power == 1.0 else mag ** self.power

        ta_tf.InverseSpectrogram = InverseSpectrogram
        ta_tf.Spectrogram = Spectrogram
        ta.transforms = ta_tf
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = ta_tf

    import scipy.signal
    if not hasattr(scipy.signal, "kaiser"):
        scipy.signal.kaiser = lambda m, beta: np.kaiser(m, beta)

    # Idempotent: another test may have installed a PARTIAL librosa stub
    # first (test_grad_parity.py stubs only filters.mel) — top up whatever
    # attributes the reference CLIs touch rather than skipping wholesale
    # (order-dependent AttributeError('load') otherwise).
    from quickvc_tpu.data.audio_io import read_wav, resample, trim_silence
    from quickvc_tpu.dsp.mel import mel_filterbank

    lib = sys.modules.get("librosa")
    if lib is None:
        lib = types.ModuleType("librosa")
        lib.__spec__ = importlib.machinery.ModuleSpec("librosa", None)
        sys.modules["librosa"] = lib
    for sub in ("effects", "filters"):
        name = f"librosa.{sub}"
        m = sys.modules.get(name) or getattr(lib, sub, None)
        if m is None:
            m = types.ModuleType(name)
            m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = m
        setattr(lib, sub, m)

    def _load(path, sr=None, **_k):
        wav, fsr = read_wav(path)
        if sr is not None and fsr != sr:
            wav, fsr = resample(wav, fsr, sr), sr
        return wav.astype(np.float32), fsr

    if not hasattr(lib, "load"):
        lib.load = _load
    if not hasattr(lib.effects, "trim"):
        lib.effects.trim = lambda y, top_db=60, **_k: trim_silence(
            y, top_db=top_db)
    if not hasattr(lib.filters, "mel"):
        lib.filters.mel = lambda *, sr, n_fft, n_mels, fmin=0.0, fmax=None: (
            mel_filterbank(sr, n_fft, n_mels, fmin, fmax))


class TorchHubertSoft(torch.nn.Module):
    """Full-architecture torch HuBERT-soft in the bshall/hubert key layout.

    Mirrors tests/test_hubert.py:TorchHubertReplica but parameterized at any
    size (production defaults = bshall HuBERT-base), with the ``units()``
    API the reference CLIs call (pad (400-320)//2 both sides,
    reference convert.py:79 / dataset/encode.py:34).
    """

    def __init__(self, d=768, layers=12, heads=12, ffn=3072, ch=512,
                 unit=256, pos_k=128, pos_g=16):
        super().__init__()
        self.feature_extractor = torch.nn.Module()
        self.feature_extractor.conv0 = torch.nn.Conv1d(1, ch, 10, 5, bias=False)
        self.feature_extractor.norm0 = torch.nn.GroupNorm(ch, ch)
        for i in range(1, 5):
            setattr(self.feature_extractor, f"conv{i}",
                    torch.nn.Conv1d(ch, ch, 3, 2, bias=False))
        for i in range(5, 7):
            setattr(self.feature_extractor, f"conv{i}",
                    torch.nn.Conv1d(ch, ch, 2, 2, bias=False))
        self.feature_projection = torch.nn.Module()
        self.feature_projection.norm = torch.nn.LayerNorm(ch)
        self.feature_projection.projection = torch.nn.Linear(ch, d)
        self.positional_embedding = torch.nn.Module()
        self.positional_embedding.conv = torch.nn.utils.weight_norm(
            torch.nn.Conv1d(d, d, pos_k, padding=pos_k // 2, groups=pos_g), dim=2)
        self.norm = torch.nn.LayerNorm(d)
        self.encoder = torch.nn.TransformerEncoder(
            torch.nn.TransformerEncoderLayer(d, heads, ffn, activation="gelu",
                                             batch_first=True, dropout=0.0),
            num_layers=layers)
        self.proj = torch.nn.Linear(d, unit)

    def forward(self, wav):  # (B, T) -> (B, T//320, unit)
        fe = self.feature_extractor
        x = torch.nn.functional.gelu(fe.norm0(fe.conv0(wav.unsqueeze(1))))
        for i in range(1, 7):
            x = torch.nn.functional.gelu(getattr(fe, f"conv{i}")(x))
        x = x.transpose(1, 2)
        x = self.feature_projection.projection(self.feature_projection.norm(x))
        p = self.positional_embedding.conv(x.transpose(1, 2))
        p = torch.nn.functional.gelu(p[:, :, :-1]).transpose(1, 2)
        x = self.norm(x + p)
        x = self.encoder(x)
        return self.proj(x)

    @torch.inference_mode()
    def units(self, wav):  # (B, 1, T), the reference CLIs' calling shape
        wav = torch.nn.functional.pad(wav, ((400 - 320) // 2, (400 - 320) // 2))
        return self.forward(wav.squeeze(1))


def load_torch_hubert(ckpt_path: str, **size_kw) -> TorchHubertSoft:
    model = TorchHubertSoft(**size_kw)
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("hubert", ckpt) if isinstance(ckpt, dict) else ckpt
    model.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})
    return model.eval()


def run_reference_convert(hpfile: str, ptfile: str, txtpath: str, outdir: str,
                          hubert: torch.nn.Module) -> None:
    """Execute /root/reference/convert.py as __main__ with shims in place."""
    install_static_shims()

    orig = (torch.Tensor.cuda, torch.nn.Module.cuda, torch.hub.load,
            torch.randn_like, list(sys.argv), list(sys.path))
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.hub.load = lambda *a, **k: hubert
    # deterministic prior sample == mean (our --noise-scale 0)
    torch.randn_like = lambda x, **k: torch.zeros_like(x)
    sys.argv = ["convert.py", "--hpfile", hpfile, "--ptfile", ptfile,
                "--txtpath", txtpath, "--outdir", outdir]
    sys.path.insert(0, REF)
    try:
        with torch.no_grad():
            runpy.run_path(f"{REF}/convert.py", run_name="__main__")
    finally:
        (torch.Tensor.cuda, torch.nn.Module.cuda, torch.hub.load,
         torch.randn_like, sys.argv[:], sys.path[:]) = orig
