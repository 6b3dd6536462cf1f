"""Model layer: flax modules for the QuickVC generator family.

All modules use time-major channels-last activations ``(B, T, C)`` — the
TPU-friendly layout (lane dim = channels). The reference's torch modules use
``(B, C, T)``; converters live at the API boundary only.
"""

from quickvc_tpu.models.layers import Conv1d, ConvTranspose1d, WNConv1d, LRELU_SLOPE  # noqa: F401
from quickvc_tpu.models.modules import (  # noqa: F401
    WaveNet,
    ResBlock1,
    ResidualCouplingBlock,
    ResidualCouplingLayer,
    CondNormalWN,
)
from quickvc_tpu.models.encoders import SpeakerEncoder  # noqa: F401
from quickvc_tpu.models.decoders import (  # noqa: F401
    ISTFTGenerator,
    MultibandISTFTGenerator,
    MultistreamISTFTGenerator,
)
from quickvc_tpu.models.discriminators import MultiPeriodDiscriminator  # noqa: F401
from quickvc_tpu.models.synthesizer import SynthesizerTrn  # noqa: F401
