"""Pose-graph optimization (PGO) on SE(3), batched for TPU.

North-star back end component (BASELINE.json config 5: "multi-host
pose-graph + distributed Schur-complement BA"). Same TPU-first shape as
models/ba.py: fixed-capacity edge list with validity masks, autodiff
per-edge Jacobians, segment-sum + dense-block normal equations, damped
Gauss-Newton inside `lax.fori_loop`. The edge-sharded distributed variant
reuses the one-psum reduction pattern (parallel/ba.py) via
``assemble_pgo_blocks`` / ``solve_pgo`` being separable.

Convention: poses are world->cam (R_i, t_i) as axis-angle+translation;
edge (i, j) measures the relative transform cam_i -> cam_j:
R_rel = R_j R_i^T, t_rel = t_j - R_rel t_i.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from sift_parallel_optimization_tpu.models.geometry import (
    rodrigues,
    rotation_log,
)


class PoseGraphEdges(NamedTuple):
    """Fixed-capacity relative-pose constraint list."""

    i: jax.Array        # (E,) i32 source node
    j: jax.Array        # (E,) i32 target node
    rel_rvec: jax.Array  # (E, 3) measured relative rotation (axis-angle)
    rel_tvec: jax.Array  # (E, 3) measured relative translation
    weight: jax.Array   # (E,) f32 information weight (0 = invalid)


class Poses(NamedTuple):
    rvecs: jax.Array  # (N, 3)
    tvecs: jax.Array  # (N, 3)


def relative_pose(ri, ti, rj, tj):
    """(rvec_rel, tvec_rel) of cam_i -> cam_j."""
    Ri, Rj = rodrigues(ri), rodrigues(rj)
    R_rel = Rj @ Ri.T
    t_rel = tj - R_rel @ ti
    return rotation_log(R_rel), t_rel


def _edge_residual(ri, ti, rj, tj, rel_r, rel_t):
    """(6,) residual: [log(R_meas^T R_rel); t_rel - t_meas]."""
    Ri, Rj = rodrigues(ri), rodrigues(rj)
    R_rel = Rj @ Ri.T
    t_rel = tj - R_rel @ ti
    e_rot = rotation_log(rodrigues(rel_r).T @ R_rel)
    e_t = t_rel - rel_t
    return jnp.concatenate([e_rot, e_t])


def pgo_residuals(poses: Poses, edges: PoseGraphEdges) -> jax.Array:
    """(E, 6) weighted residuals (zero for invalid edges)."""
    r = jax.vmap(_edge_residual)(
        poses.rvecs[edges.i], poses.tvecs[edges.i],
        poses.rvecs[edges.j], poses.tvecs[edges.j],
        edges.rel_rvec, edges.rel_tvec,
    )
    return r * jnp.sqrt(jnp.maximum(edges.weight, 0.0))[:, None]


def pgo_rms(poses: Poses, edges: PoseGraphEdges) -> jax.Array:
    r = pgo_residuals(poses, edges)
    n = jnp.maximum((edges.weight > 0).sum(), 1)
    return jnp.sqrt(jnp.sum(r * r) / n)


def _f32_precision(fn):
    """HIGHEST matmul precision wrapper (see models/geometry.py)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


@_f32_precision
def assemble_pgo_blocks(poses: Poses, edges: PoseGraphEdges):
    """Normal-equation blocks; summing over edge shards commutes, so a
    psum over the returned pytree yields the global system."""
    N = poses.rvecs.shape[0]

    def one(ri, ti, rj, tj, rel_r, rel_t, w):
        def f(theta):
            return _edge_residual(
                theta[:3], theta[3:6], theta[6:9], theta[9:], rel_r, rel_t
            ) * jnp.sqrt(jnp.maximum(w, 0.0))

        theta = jnp.concatenate([ri, ti, rj, tj])
        jac = jax.jacfwd(f)(theta)          # (6, 12)
        return jac[:, :6], jac[:, 6:], f(theta)

    ji, jj, r = jax.vmap(one)(
        poses.rvecs[edges.i], poses.tvecs[edges.i],
        poses.rvecs[edges.j], poses.tvecs[edges.j],
        edges.rel_rvec, edges.rel_tvec, edges.weight,
    )                                        # (E,6,6) (E,6,6) (E,6)

    # Gauge: node 0 fixed.
    keep_i = (edges.i != 0)[:, None, None].astype(ji.dtype)
    keep_j = (edges.j != 0)[:, None, None].astype(jj.dtype)
    ji = ji * keep_i
    jj = jj * keep_j

    hii = jax.ops.segment_sum(
        jnp.einsum("eab,eac->ebc", ji, ji), edges.i, N
    )
    hjj = jax.ops.segment_sum(
        jnp.einsum("eab,eac->ebc", jj, jj), edges.j, N
    )
    b = -(
        jax.ops.segment_sum(jnp.einsum("eab,ea->eb", ji, r), edges.i, N)
        + jax.ops.segment_sum(jnp.einsum("eab,ea->eb", jj, r), edges.j, N)
    )
    w_ij = jnp.einsum("eab,eac->ebc", ji, jj)   # (E, 6, 6)
    # Flat-index segment_sum beats the 2-D scatter on TPU (see models/ba.py).
    cross = jax.ops.segment_sum(
        w_ij.reshape(-1, 36), edges.i * N + edges.j, N * N
    ).reshape(N, N, 6, 6)
    return hii + hjj, cross, b


@_f32_precision
def solve_pgo(hdiag, cross, b, damping: float = 1e-3):
    """Dense solve of the (6N, 6N) system -> (N, 6) update."""
    N = hdiag.shape[0]
    h = cross + cross.transpose(1, 0, 3, 2)
    h = h.at[jnp.arange(N), jnp.arange(N)].add(hdiag)
    # Marquardt-scaled damping (see models/ba.py for the f32 rationale).
    hd = h[jnp.arange(N), jnp.arange(N)]
    d = jnp.diagonal(hd, axis1=-2, axis2=-1)
    h = h.at[jnp.arange(N), jnp.arange(N)].add(
        (damping * d + 1e-6)[..., None] * jnp.eye(6)
    )
    hd_dense = h.transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)
    m0 = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (N - 1))])
    hd_dense = hd_dense * m0[:, None] * m0[None, :] + jnp.diag(1.0 - m0)
    b = b.at[0].set(0.0)
    return jnp.linalg.solve(hd_dense, b.reshape(-1)).reshape(N, 6)


def pgo_step(
    poses: Poses, edges: PoseGraphEdges, damping: float = 1e-3
) -> Poses:
    hdiag, cross, b = assemble_pgo_blocks(poses, edges)
    delta = solve_pgo(hdiag, cross, b, damping)
    return Poses(
        rvecs=poses.rvecs + delta[:, :3],
        tvecs=poses.tvecs + delta[:, 3:],
    )


def optimize_pose_graph(
    poses: Poses,
    edges: PoseGraphEdges,
    n_iters: int = 20,
    damping: float = 1e-3,
) -> Poses:
    """Damped Gauss-Newton PGO with a static trip count (jit this)."""

    def body(_, p):
        return pgo_step(p, edges, damping)

    return lax.fori_loop(0, n_iters, body, poses)
