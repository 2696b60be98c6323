"""Checkpoint / resume for pipeline state (orbax-backed).

Aux subsystem the reference lacks entirely (SURVEY.md section 5: its only
"state reset" is re-filling the pyramid in place, GaussDePyramid-MPI.h:87-114).
Here: any pytree of arrays (SfmMap, BAState, bench sweep state) can be
saved atomically and restored, giving the incremental SfM driver
restartable steps — the failure-recovery story for long sequences.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import jax
import numpy as np


def save_pytree(path: str | os.PathLike, tree: Any, step: int = 0) -> None:
    """Atomically save a pytree of arrays + the step counter."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path / f"step_{step}",
            {"tree": jax.tree.map(np.asarray, tree), "step": step},
            force=True,
        )


def latest_step(path: str | os.PathLike) -> int | None:
    """Highest step with a complete checkpoint under ``path``, else None."""
    path = Path(path)
    if not path.is_dir():
        return None
    steps = []
    for d in path.iterdir():
        name = d.name
        if name.startswith("step_") and name[5:].isdigit():
            steps.append(int(name[5:]))
    return max(steps) if steps else None


def load_pytree(path: str | os.PathLike, like: Any, step: int | None = None):
    """Restore (tree, step); ``like`` provides structure/shape/dtype."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
    with ocp.StandardCheckpointer() as ckptr:
        target = {
            "tree": jax.tree.map(np.asarray, like),
            "step": step,
        }
        out = ckptr.restore(path / f"step_{step}", target)
    tree = jax.tree.map(
        lambda l, a: jax.numpy.asarray(a), like, out["tree"]
    )
    return tree, int(out["step"])
