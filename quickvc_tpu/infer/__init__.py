"""Inference layer: batch and streaming-chunk synthesis."""

from quickvc_tpu.infer.streaming import streaming_infer  # noqa: F401
