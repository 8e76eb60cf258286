"""Checkpoint / resume — the durable-state subsystem the reference lacks
(SURVEY.md §5: reference saves best ``state_dict`` only, no optimizer state,
no step counter, no mid-run resume — ``node classification/main-batch.py:
154-155``, ``spatial-temporal/main.py:130-143``).

Design: orbax-backed sharded checkpoints of the full train state
(params + optimizer state + step + RNG key + metadata), plus a light
"best-state" slot mirroring the reference's save-best-only pattern.
Deterministic resume: the RNG key is part of the state, so a restored run
continues the exact dropout/shuffle stream.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, state: Any, *, force: bool = True):
    """Save a pytree train state to ``path`` (directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ck:
        ck.save(path, state, force=force)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore into the structure of ``template`` (same pytree/shapes)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ck:
        return ck.restore(path, template)


class CheckpointManager:
    """Step-indexed manager with retention + best-slot tracking."""

    def __init__(self, directory: str, *, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best_metric = -np.inf

    def save(self, step: int, state: Any, *, metrics: Optional[dict] = None):
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics)

    def save_if_best(self, step: int, state: Any, metric: float):
        """Reference save-best-only parity (gated on val improvement)."""
        if metric > self._best_metric:
            self._best_metric = metric
            save_checkpoint(os.path.join(self.directory, "best"), state)
            return True
        return False

    def restore_best(self, template: Any):
        return restore_checkpoint(os.path.join(self.directory, "best"),
                                  template)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: int, template: Any):
        import orbax.checkpoint as ocp

        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(template))

    def close(self):
        self._mgr.close()
