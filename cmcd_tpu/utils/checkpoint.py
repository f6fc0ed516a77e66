"""Periodic checkpointing and resume via orbax.

New capability vs the reference, which only pickles final params into a
wandb artifact (src/main.py:289-301) and cannot resume a run (SURVEY.md §5).
Checkpoints hold params, optimizer state, PRNG key, and the step counter.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as onp
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, params, opt_state=None, key=None,
             extra: Optional[dict] = None, wait: bool = False):
        """Persist the full training state.

        ASYNC by default: orbax copies the arrays to host before
        returning, then writes in a background thread, so periodic
        checkpoints overlap with training instead of stalling a chunk
        boundary. Commits are atomic (tmp dir + rename) — a checkpoint
        killed mid-write never becomes `latest_step`. wait=True blocks
        until the write is durable (the trainer's final save)."""
        state = {"params": params}
        if opt_state is not None:
            state["opt_state"] = opt_state
        if key is not None:
            state["key"] = key
        if extra:
            state["extra"] = extra
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mngr.wait_until_finished()

    def wait(self):
        """Block until all pending async saves are committed."""
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self._mngr.wait_until_finished()
        return self._mngr.latest_step()

    def restore(self, step: Optional[int] = None, template: Any = None):
        self._mngr.wait_until_finished()
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        if template is not None:
            restored = self._mngr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        else:
            restored = self._mngr.restore(step)
        return step, restored

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()
