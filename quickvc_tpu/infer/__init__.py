"""Inference layer: batch, streaming-chunk, and live (real-time) synthesis."""

from quickvc_tpu.infer.realtime import RealtimeSession, RealtimeWaveSession  # noqa: F401
from quickvc_tpu.infer.streaming import streaming_infer  # noqa: F401
