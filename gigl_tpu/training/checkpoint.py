"""Checkpoint save/restore (orbax).

Ref parity: `training/v1/lib/training_process.py:59-83` save_model — state
dict written to GCS on rank 0 + barrier; warm-start loads `trained_model_uri`
(:268-285). Orbax handles the distributed single-writer semantics; warm
start maps to ``restore_params``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from gigl_tpu.data.uri import LocalUri, Uri, UriFactory


def _as_local_dir(uri) -> str:
    u = UriFactory.create(uri)
    if not isinstance(u, LocalUri):
        raise NotImplementedError(
            "Cloud checkpoint URIs require a registered backend; use a local "
            "path or mount.")
    p = u.path
    p.mkdir(parents=True, exist_ok=True)
    return str(p.resolve())


def save_params(uri, params: Any, *, step: int = 0) -> None:
    path = _as_local_dir(uri)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, f"step_{step}"), params, force=True)


def restore_params(uri, *, step: Optional[int] = None,
                   template: Optional[Any] = None) -> Any:
    path = _as_local_dir(uri)
    if step is None:
        steps = sorted(
            int(d.split("_", 1)[1])
            for d in os.listdir(path) if d.startswith("step_"))
        if not steps:
            raise FileNotFoundError(f"No checkpoints under {path}")
        step = steps[-1]
    with ocp.StandardCheckpointer() as ckptr:
        target = os.path.join(path, f"step_{step}")
        if template is not None:
            return ckptr.restore(target, template)
        return ckptr.restore(target)


def save_train_state(uri, state: Any, *, step: int = 0) -> None:
    """Save a FULL TrainState (params + optimizer state + step counter +
    loss sketches) for mid-training resume.

    Goes beyond the reference, which checkpoints only the model state dict
    at end of training (training_process.py:59-83; "no mid-epoch
    checkpointing", SURVEY §5) — component-level restartability was its only
    recovery story. Here a preempted TPU job resumes exactly.
    """
    path = _as_local_dir(uri)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, f"state_{step}"), state, force=True)


def restore_train_state(uri, template: Any, *, step: Optional[int] = None):
    """Restore a TrainState saved by save_train_state. ``template`` is a
    same-structure TrainState (e.g. from trainer.init_state) supplying the
    pytree structure and array shapes/dtypes."""
    path = _as_local_dir(uri)
    if step is None:
        steps = sorted(
            int(d.split("_", 1)[1])
            for d in os.listdir(path) if d.startswith("state_"))
        if not steps:
            raise FileNotFoundError(f"No train-state checkpoints under {path}")
        step = steps[-1]
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(path, f"state_{step}"), template)


def latest_step(uri, prefix: str = "state_") -> Optional[int]:
    """Highest checkpointed step under ``uri`` (None if none) — the resume
    probe for preempted jobs."""
    try:
        path = _as_local_dir(uri)
    except FileNotFoundError:
        return None
    steps = [int(d.split("_", 1)[1])
             for d in os.listdir(path) if d.startswith(prefix)]
    return max(steps) if steps else None
