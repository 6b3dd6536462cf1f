"""Training layer: train state, the jitted GAN step, and the training loop."""

from quickvc_tpu.train.state import TrainState, create_train_state  # noqa: F401
from quickvc_tpu.train.step import make_train_step  # noqa: F401
