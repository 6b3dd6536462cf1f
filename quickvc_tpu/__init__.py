"""QuickVC-TPU: a TPU-native (JAX/XLA/Pallas/pjit) voice-conversion framework.

A ground-up re-design of the capabilities of tarepan/QuickVC-official
(any-to-many voice conversion: HuBERT-soft content units + LSTM speaker
d-vectors + VITS-style CVAE with an MS-iSTFT multi-stream decoder), built
TPU-first:

- all compute paths are pure-functional JAX, jitted and shardable via
  ``jax.sharding.Mesh`` + NamedSharding (data parallel over ICI),
- hot DSP ops (STFT, iSTFT head, PQMF) are expressed as matmuls/convs that
  map onto the MXU, with Pallas kernels for the fused synthesis head,
- layouts are time-major ``(B, T, C)`` (channels-last) throughout, the
  TPU-friendly layout, unlike the reference's torch ``(B, C, T)``.

Reference parity notes cite /root/reference files as ``file:line``.
"""

__version__ = "0.1.0"

from quickvc_tpu.config import QuickVCConfig, load_config  # noqa: F401
