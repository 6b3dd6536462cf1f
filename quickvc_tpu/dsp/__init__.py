"""DSP / featurization layer.

Pure functions, golden-tested against torch.stft / torch.istft / scipy.
TPU-first design notes:

- spectrogram layout is time-major ``(B, Frame, Freq)`` (channels-last),
- the decoder-head inverse STFT (n_fft=16) is expressed as two tiny DFT
  matmuls plus a shifted-add overlap-add (no scatter ops),
- PQMF analysis/synthesis are strided / input-dilated XLA convolutions.
"""

from quickvc_tpu.dsp.mel import mel_filterbank  # noqa: F401
from quickvc_tpu.dsp.stft import (  # noqa: F401
    hann_window,
    magnitude_stft,
    spec_to_mel,
    wave_to_mel,
    wave_to_spec,
)
from quickvc_tpu.dsp.istft import inverse_stft, polar_inverse_stft  # noqa: F401
from quickvc_tpu.dsp.pqmf import PQMFBank, design_prototype_filter  # noqa: F401
