"""Checkpoint/resume for long SfM runs (orbax).

SURVEY.md §5: the reference needs none (runs are seconds); the SfM layer does.
State = any pytree (BAProblem, PoseGraph, model TrainState, ...).
"""

from __future__ import annotations

from pathlib import Path

import jax

__all__ = ["save_state", "restore_state", "latest_step"]


def _mgr(directory):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(Path(directory).absolute())


def save_state(directory, step: int, state) -> None:
    """Save a pytree checkpoint at ``step`` under ``directory``."""
    import orbax.checkpoint as ocp

    with _mgr(directory) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def restore_state(directory, step: int | None = None, template=None):
    """Restore the pytree at ``step`` (default: latest).

    ``template``: an example pytree (with correct structure/shapes/dtypes) —
    required to restore custom dataclasses like BAProblem; without it, plain
    nested dicts/arrays are returned.
    """
    import orbax.checkpoint as ocp

    with _mgr(directory) as mgr:
        if step is None:
            step = mgr.latest_step()
        if template is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
                if hasattr(x, "shape")
                else x,
                template,
            )
            return mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        return mgr.restore(step)


def latest_step(directory) -> int | None:
    with _mgr(directory) as mgr:
        return mgr.latest_step()
