"""Checkpoint/resume via orbax (reference: fire-and-forget torch.save only,
SURVEY.md SS5 — angellic.py:232, cifar_swag.py:76-83, model_wrapper.py:70-97).

Saves/restores arbitrary pytrees (model variables, SWAG states, patches,
optimizer states) with versioned steps and latest-step resume.
"""

from __future__ import annotations

import os
from typing import Any


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, tree: Any, step: int | None = None) -> str:
    """Save a pytree; with ``step`` the path becomes <path>/step_<n>."""
    import jax

    target = os.path.join(path, f"step_{step}") if step is not None else path
    target = os.path.abspath(target)
    _checkpointer().save(target, jax.device_get(tree), force=True)
    return target


def latest_step(path: str) -> int | None:
    if not os.path.isdir(path):
        return None
    steps = [
        int(d.split("_", 1)[1])
        for d in os.listdir(path)
        if d.startswith("step_") and d.split("_", 1)[1].isdigit()
    ]
    return max(steps) if steps else None


def load_checkpoint(path: str, step: int | None = None) -> Any:
    """Load a pytree; without ``step`` resumes the latest step (or the bare
    path if unversioned)."""
    if step is None:
        s = latest_step(path)
        target = os.path.join(path, f"step_{s}") if s is not None else path
    else:
        target = os.path.join(path, f"step_{step}")
    return _checkpointer().restore(os.path.abspath(target))
