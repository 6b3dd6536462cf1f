"""Orbax checkpointing of the single train-state pytree.

Reference equivalent: ``utils.save_checkpoint``/``load_checkpoint``/
``latest_checkpoint_path`` (utils.py:147-203), which torch-pickle G and D
separately every eval_interval steps. Here the whole TrainState (G+D params,
both optimizer states, step) is one orbax checkpoint — async-capable and
multi-host-safe out of the box.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for the train state."""

    def __init__(self, model_dir: str, max_to_keep: int = 5):
        path = os.path.abspath(os.path.join(model_dir, "checkpoints"))
        os.makedirs(path, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            path, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                       create=True))

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore_latest(self, abstract_state: Any) -> tuple[Any, int] | None:
        """Restore the newest checkpoint into the given abstract pytree.

        Returns (state, step) or None if no checkpoint exists (reference
        train.py:61-68 falls back to scratch on any restore failure).
        """
        step = self._mgr.latest_step()
        if step is None:
            return None
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))
        return state, int(step)

    def wait(self) -> None:
        self._mgr.wait_until_finished()
