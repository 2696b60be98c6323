"""Sliding-window visual odometry: O(window) memory for long sequences.

`models/sfm.py`'s map capacities scale with the TOTAL frame count
(C = n, P = n*B, M ~ 3*P) — fine for the ~50-keyframe north-star scene,
quadratic-cost BA and unbounded memory for long sequences. This module is
the constant-memory companion: a fixed WINDOW of the most recent frames
is kept in a map of static capacity (C = W cameras, P = W*B points,
M = 3*W*B observations); older frames are EVICTED by shifting every
block-structured array left by one frame slot, and their poses are frozen
into the output trajectory.

TPU-first structure (no reference analogue — the reference has no SfM):

* The shift is a static-shape roll: cameras move down one slot, point
  blocks down B slots, observation blocks down 3*B slots, and the
  observation indices are decremented in place — one fused elementwise
  pass, no gather tables, one compiled executable for every frame.
* Because eviction renumbers slots, a full window always registers the
  new frame at slot W-1 against slot W-2 — the register step is the SAME
  jitted `register_frame` used by global SfM, with a CONSTANT frame
  index, so the steady state reuses one executable forever.
* Window BA gauge-fixes slot 0 — the oldest surviving camera, whose pose
  is already consistent with the frozen past — anchoring each window to
  the trajectory that has left it (classic marginalization-by-fixing;
  no prior blocks needed for the fixed-lambda GN used here).

Observations referencing an evicted camera or an evicted landmark are
invalidated by the shift mask; landmarks live at most W frames (their
birth block leaves the window with their birth frame).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from sift_parallel_optimization_tpu.models.ba import (
    Observations,
    bundle_adjust,
)
from sift_parallel_optimization_tpu.models.frontend import Features
from sift_parallel_optimization_tpu.models.sfm import (
    SfmMap,
    empty_map,
    init_two_view,
    register_frame,
)


class Trajectory(NamedTuple):
    """Full-sequence pose estimates (world->cam axis-angle + translation)."""

    rvecs: jax.Array  # (n, 3)
    tvecs: jax.Array  # (n, 3)


def shift_window(m: SfmMap, pts_per_frame: int) -> SfmMap:
    """Evict frame slot 0: shift every per-frame block down one slot.

    Cameras shift by 1, point blocks by B, observation blocks by 3*B
    (matching `register_frame`'s static block layout). Observation camera
    and point indices are decremented; rows that now reference the evicted
    camera (cam_idx < 0) or an evicted landmark block (pt_idx < 0) are
    invalidated. All shapes static — jit once, reuse every eviction.
    """
    B = pts_per_frame

    def shift(arr, k):
        pad = jnp.zeros((k,) + arr.shape[1:], arr.dtype)
        return jnp.concatenate([arr[k:], pad], axis=0)

    obs = m.obs
    cam_idx = obs.cam_idx - 1
    pt_idx = obs.pt_idx - B
    valid = obs.valid & (cam_idx >= 0) & (pt_idx >= 0)
    obs = Observations(
        cam_idx=shift(jnp.maximum(cam_idx, 0), 3 * B),
        pt_idx=shift(jnp.maximum(pt_idx, 0), 3 * B),
        uv=shift(obs.uv, 3 * B),
        valid=shift(valid, 3 * B),
    )
    return SfmMap(
        rvecs=shift(m.rvecs, 1),
        tvecs=shift(m.tvecs, 1),
        cam_valid=shift(m.cam_valid, 1),
        points=shift(m.points, B),
        pt_valid=shift(m.pt_valid, B),
        pt_desc=shift(m.pt_desc, B),
        obs=obs,
    )


def run_odometry(
    key,
    features: Sequence[Features],
    K: jax.Array,
    window: int = 8,
    pts_per_frame: int = 128,
    ba_every: int = 2,
    ba_iters: int = 8,
    damping: float = 1e-4,
    huber_delta: float | None = 2.0,
    solver: str = "auto",
) -> tuple[Trajectory, SfmMap]:
    """Constant-memory odometry over a frame sequence of ANY length.

    Returns the full (n, 3)+(n, 3) trajectory plus the final window map
    (whose capacities depend only on ``window`` and ``pts_per_frame``).
    Poses of evicted frames are frozen at eviction time; frames still in
    the final window carry the last window-BA refinement.

    ``solver`` picks the window-BA Schur solver ("auto" resolves from the
    window capacities — small windows keep the dense solve, wide windows
    take the implicit-Schur CG path; models/ba.py resolve_solver).
    """
    n = len(features)
    W = window
    if W < 3:
        raise ValueError("window must be >= 3 (bootstrap pair + PnP frame)")
    m = empty_map(W, pts_per_frame, max_loops=0)
    keys = jax.random.split(key, n)

    init_fn = jax.jit(
        functools.partial(init_two_view, pts_per_frame=pts_per_frame)
    )
    reg_fn = jax.jit(
        functools.partial(register_frame, pts_per_frame=pts_per_frame)
    )
    shift_fn = jax.jit(
        functools.partial(shift_window, pts_per_frame=pts_per_frame)
    )
    from sift_parallel_optimization_tpu.models.ba import resolve_solver

    solver = resolve_solver(W, W * pts_per_frame, solver)
    ba_kwargs: dict = dict(
        damping=damping, huber_delta=huber_delta, solver=solver,
    )
    if solver == "cg":
        # A window landmark sees at most every window frame (2 birth obs
        # + one PnP re-observation per remaining frame).
        ba_kwargs["max_obs_per_point"] = -(-W // 8) * 8
    ba_fn = jax.jit(
        functools.partial(bundle_adjust, n_iters=ba_iters, **ba_kwargs)
    )

    frozen_r: list[jax.Array] = []   # evicted poses, world frame, final
    frozen_t: list[jax.Array] = []

    m, used = init_fn(keys[0], features[0], features[1], K, m)
    for i in range(2, n):
        if i >= W:
            # Slot 0 (frame i - W) leaves the window; its pose is final.
            frozen_r.append(m.rvecs[0])
            frozen_t.append(m.tvecs[0])
            m = shift_fn(m)
        slot = min(i, W - 1)
        m, used = reg_fn(
            keys[i], m, features[i], features[i - 1],
            jnp.asarray(slot, jnp.int32), K, used,
        )
        if ba_every and (i % ba_every == 0 or i == n - 1):
            st = ba_fn(m.ba_state(), m.obs, K)
            m = m._replace(rvecs=st.rvecs, tvecs=st.tvecs, points=st.points)

    in_window = min(n, W)
    rvecs = jnp.stack(frozen_r + [m.rvecs[s] for s in range(in_window)])
    tvecs = jnp.stack(frozen_t + [m.tvecs[s] for s in range(in_window)])
    return Trajectory(rvecs=rvecs, tvecs=tvecs), m
