"""Checkpoint save/restore (orbax-backed).

Replaces Lightning's auto-checkpointing + ``load_from_checkpoint`` resume
(reference launcher.py:97-117, lightning_logs/version_N/checkpoints/): we
persist the full training triple (params, state, opt_state) plus the step
counter, and restore it deterministically.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_checkpoint(directory: str, step: int, params: Any, state: Any = None, opt_state: Any = None) -> str:
    """Write a checkpoint under ``directory/step_N``. Returns the path."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step}")
    payload = {"params": params}
    if state:
        payload["state"] = state
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: Optional[int] = None, template: Any = None) -> dict:
    """Restore ``{"params": ..., "state": ..., "opt_state": ...}``.

    ``template`` (a matching pytree of arrays) enables exact dtype/shape
    restoration; without it orbax restores as numpy arrays.
    """
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckptr = _checkpointer()
    restored = ckptr.restore(path, target=template) if template is not None else ckptr.restore(path)
    return restored
