"""Infra layer: checkpointing, logging, plotting, torch checkpoint port."""

from quickvc_tpu.utils.checkpoint import CheckpointManager  # noqa: F401
from quickvc_tpu.utils.logging import get_logger, Summarizer  # noqa: F401
