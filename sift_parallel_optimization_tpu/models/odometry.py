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


class LandmarkArchive(NamedTuple):
    """Fixed-capacity ring of EVICTED landmarks for loop closure.

    When a frame leaves the window its landmark block is frozen — world
    positions, appearance descriptors, birth frame — into this ring
    (capacity A, write head wraps). The archive is the window pipeline's
    long-term place memory: the current frame's descriptors are matched
    against it (one masked MXU matmul, the same machinery as
    models/loop_closure.py) and a PnP against the archived world points
    yields an ABSOLUTE pose constraint — metric scale comes from the
    archived map for free.
    """

    positions: jax.Array  # (A, 3) world coordinates, frozen at eviction
    desc: jax.Array       # (A, 128)
    birth: jax.Array      # (A,) i32 global frame id of the birth keyframe
    valid: jax.Array      # (A,)


def empty_archive(capacity: int) -> LandmarkArchive:
    return LandmarkArchive(
        positions=jnp.zeros((capacity, 3), jnp.float32),
        desc=jnp.zeros((capacity, 128), jnp.float32),
        birth=jnp.zeros(capacity, jnp.int32),
        valid=jnp.zeros(capacity, bool),
    )


def archive_evicted_block(
    arch: LandmarkArchive,
    m: SfmMap,
    write_slot,
    birth_frame,
    pts_per_frame: int,
) -> LandmarkArchive:
    """Freeze window slot 0's landmark block into the ring before a shift.

    ``write_slot`` counts evictions (traced); the block lands at ring
    offset (write_slot * B) mod A. One compiled executable serves every
    eviction (dynamic_update_slice with a traced offset).
    """
    from jax import lax

    B = pts_per_frame
    A = arch.valid.shape[0]
    start = (jnp.asarray(write_slot, jnp.int32) * B) % A

    def upd(arr, vals):
        return lax.dynamic_update_slice_in_dim(
            arr, vals.astype(arr.dtype), start, axis=0
        )

    return LandmarkArchive(
        positions=upd(arch.positions, m.points[:B]),
        desc=upd(arch.desc, m.pt_desc[:B]),
        birth=upd(
            arch.birth,
            jnp.full(B, jnp.asarray(birth_frame, jnp.int32)),
        ),
        valid=upd(arch.valid, m.pt_valid[:B]),
    )


class ArchiveLoop(NamedTuple):
    rvec: jax.Array       # (3,) absolute world->cam PnP pose
    tvec: jax.Array       # (3,)
    n_inliers: jax.Array  # () i32 — host gates acceptance


def propose_archive_loop(
    key,
    feats: Features,
    arch: LandmarkArchive,
    frame_i,
    K: jax.Array,
    min_gap: int = 8,
    threshold: float = 3.0,
) -> ArchiveLoop:
    """PnP the current frame against archived landmarks born >= min_gap
    frames ago. Jittable with a traced ``frame_i``; acceptance is the
    caller's host-side decision (same split as models/loop_closure.py)."""
    from sift_parallel_optimization_tpu.models.matching import (
        match_descriptors,
    )
    from sift_parallel_optimization_tpu.models.sfm import ransac_pnp

    old = arch.valid & (
        arch.birth <= jnp.asarray(frame_i, jnp.int32) - min_gap
    )
    match = match_descriptors(
        feats.descriptors, arch.desc, feats.keypoints.valid, old
    )
    uv = jnp.stack([feats.keypoints.x, feats.keypoints.y], -1)
    pts3d = arch.positions[match.idx2]
    mask = match.valid & old[match.idx2]
    cam, _inl, n = ransac_pnp(key, pts3d, uv, mask, K, threshold=threshold)
    return ArchiveLoop(rvec=cam.rvec, tvec=cam.tvec, n_inliers=n)


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
    loop_closure: bool = False,
    loop_min_gap: int | None = None,
    loop_min_inliers: int = 25,
    loop_weight: float = 4.0,
    loop_cooldown: int = 3,
    max_loops: int = 8,
    archive_size: int | None = None,
) -> tuple[Trajectory, SfmMap]:
    """Constant-memory odometry over a frame sequence of ANY length.

    Returns the full (n, 3)+(n, 3) trajectory plus the final window map
    (whose capacities depend only on ``window`` and ``pts_per_frame``).
    Poses of evicted frames are frozen at eviction time; frames still in
    the final window carry the last window-BA refinement.

    ``solver`` picks the window-BA Schur solver ("auto" resolves from the
    window capacities — small windows keep the dense solve, wide windows
    take the implicit-Schur CG path; models/ba.py resolve_solver).

    ``loop_closure`` composes the window pipeline with revisit
    correction: evicted landmark blocks are frozen into a fixed-capacity
    :class:`LandmarkArchive` ring, every frame is PnP-matched against it
    (:func:`propose_archive_loop`), and accepted constraints feed ONE
    pose-graph optimization over the full trajectory at the end —
    odometry-chain edges from the estimates, absolute loop edges at node
    0 (the archived map lives in camera-0's frame). The PGO's matrix-free
    CG solver (models/pose_graph.py) keeps this O(n) even for
    thousand-frame sequences, preserving the O(window) memory story
    (the archive ring is the only per-sequence state, and its capacity
    is fixed).

    ``loop_min_gap`` defaults to ``window + 1`` (an archived landmark is
    at least ``window`` frames old by construction; +1 rejects border
    cases). ``loop_cooldown`` skips proposals for that many frames after
    an acceptance, so one revisit yields one constraint, not a burst.
    ``archive_size`` (landmark slots) defaults to 64 eviction blocks.
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

    arch = None
    loop_frames: list[int] = []
    loop_poses: list = []
    last_loop = -(10**9)
    if loop_closure:
        if loop_min_gap is None:
            loop_min_gap = W + 1
        if archive_size is None:
            archive_size = 64 * pts_per_frame
        arch = empty_archive(archive_size)
        arch_fn = jax.jit(
            functools.partial(
                archive_evicted_block, pts_per_frame=pts_per_frame
            )
        )
        loop_fn = jax.jit(
            functools.partial(propose_archive_loop, min_gap=loop_min_gap)
        )
        loop_keys = jax.random.split(jax.random.fold_in(key, 11), n)

    m, used = init_fn(keys[0], features[0], features[1], K, m)
    for i in range(2, n):
        if i >= W:
            # Slot 0 (frame i - W) leaves the window; its pose is final.
            frozen_r.append(m.rvecs[0])
            frozen_t.append(m.tvecs[0])
            if loop_closure:
                arch = arch_fn(
                    arch, m,
                    jnp.asarray(i - W, jnp.int32),
                    jnp.asarray(i - W, jnp.int32),
                )
            m = shift_fn(m)
        slot = min(i, W - 1)
        m, used = reg_fn(
            keys[i], m, features[i], features[i - 1],
            jnp.asarray(slot, jnp.int32), K, used,
        )
        if ba_every and (i % ba_every == 0 or i == n - 1):
            st = ba_fn(m.ba_state(), m.obs, K)
            m = m._replace(rvecs=st.rvecs, tvecs=st.tvecs, points=st.points)
        if (
            loop_closure
            and i > W  # archive non-empty (first eviction at i == W)
            and i - last_loop > loop_cooldown
            and len(loop_frames) < max_loops
        ):
            prop = loop_fn(
                loop_keys[i], features[i], arch,
                jnp.asarray(i, jnp.int32), K,
            )
            if int(prop.n_inliers) >= loop_min_inliers:
                loop_frames.append(i)
                loop_poses.append(prop)
                last_loop = i

    in_window = min(n, W)
    rvecs = jnp.stack(frozen_r + [m.rvecs[s] for s in range(in_window)])
    tvecs = jnp.stack(frozen_t + [m.tvecs[s] for s in range(in_window)])
    traj = Trajectory(rvecs=rvecs, tvecs=tvecs)
    if loop_closure and loop_frames:
        traj = correct_trajectory(
            traj, loop_frames, loop_poses, loop_weight=loop_weight
        )
    return traj, m


def correct_trajectory(
    traj: Trajectory,
    loop_frames: Sequence[int],
    loop_poses: Sequence[ArchiveLoop],
    loop_weight: float = 4.0,
    pgo_iters: int = 15,
    damping: float = 1e-4,
) -> Trajectory:
    """Pose-graph-correct a frozen trajectory with absolute loop edges.

    Edges: the odometry chain (consecutive relative poses from the
    estimates — exactly consistent, carrying the accumulated drift) plus
    one edge (0 -> f) per accepted loop whose measurement is the PnP
    pose composed with node 0 (the archive lives in camera-0's frame).
    The PGO redistributes the loop error along the chain (models/
    pose_graph.py; the CG solver keeps this O(n) at any length).
    """
    from sift_parallel_optimization_tpu.models.loop_closure import (
        build_pose_graph_edges,
    )
    from sift_parallel_optimization_tpu.models.geometry import Camera
    from sift_parallel_optimization_tpu.models.pose_graph import (
        Poses,
        optimize_pose_graph,
    )

    n = traj.rvecs.shape[0]
    edges = build_pose_graph_edges(
        traj, n, list(loop_frames),
        [Camera(rvec=p.rvec, tvec=p.tvec) for p in loop_poses],
        loop_weight=loop_weight,
    )
    poses = Poses(rvecs=traj.rvecs, tvecs=traj.tvecs)
    out = jax.jit(
        lambda p, e: optimize_pose_graph(
            p, e, n_iters=pgo_iters, damping=damping
        )
    )(poses, edges)
    return Trajectory(rvecs=out.rvecs, tvecs=out.tvecs)
