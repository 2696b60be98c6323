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


def save_pytree(
    path: str | os.PathLike,
    tree: Any,
    step: int = 0,
    meta: dict | None = None,
) -> None:
    """Atomically save a pytree of arrays + the step counter.

    ``meta`` (a small JSON-able config fingerprint, e.g. sequence id and
    capacities) is stored alongside; ``load_pytree`` verifies it so a
    checkpoint directory reused across differently-configured runs fails
    loudly instead of silently resuming the wrong sequence.
    """
    import json

    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path / f"step_{step}",
            {"tree": jax.tree.map(np.asarray, tree), "step": step},
            force=True,
        )
    if meta is not None:
        (path / f"step_{step}.meta.json").write_text(json.dumps(meta))


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


def load_pytree(
    path: str | os.PathLike,
    like: Any,
    step: int | None = None,
    meta: dict | None = None,
    meta_defaults: dict | None = None,
):
    """Restore (tree, step); ``like`` provides structure/shape/dtype.

    If ``meta`` is given, every key it contains must match the
    fingerprint stored by ``save_pytree`` (when one exists) — a mismatch
    raises ValueError. A key MISSING from the saved fingerprint (a
    checkpoint written before that config knob existed) is accepted only
    when the requested value equals ``meta_defaults[key]`` — the
    behavior checkpoints of that era actually had (e.g. pre-round-4
    odometry checkpoints implicitly ran archive_policy="fifo"). Keys
    present only in the saved fingerprint are ignored: the restore's
    pytree-structure match is the shape guard, and a newer run may
    legitimately drop a knob from its fingerprint.
    """
    import json

    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
    if meta is not None:
        meta_path = path / f"step_{step}.meta.json"
        if meta_path.exists():
            saved = json.loads(meta_path.read_text())
            defaults = meta_defaults or {}
            for k, want in meta.items():
                if k not in saved and k not in defaults:
                    # No record and no declared default: refuse — we
                    # cannot know what the old run did.
                    raise ValueError(
                        f"checkpoint fingerprint under {path} lacks "
                        f"{k!r} and no compatibility default is "
                        "declared; refusing to resume"
                    )
                have = saved[k] if k in saved else defaults[k]
                if have != want:
                    raise ValueError(
                        f"checkpoint fingerprint mismatch under {path}: "
                        f"{k}={have!r} (saved) != {want!r} (requested); "
                        "refusing to resume a differently-configured run"
                    )
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
