"""Sim(3) pose-graph optimization: loop closure with per-node SCALE.

Monocular odometry drifts in scale, and an SE(3) pose graph
(models/pose_graph.py) structurally cannot absorb it: every chain edge's
translation LENGTH is fixed by its measurement, so absolute loop
constraints fight the chain instead of shrinking it. Round-3 measurement
(40-frame two-cycle revisit, 256^2, chip): the first cycle's apex keeps
a smooth ~40%-of-span scale bump that SE(3) PGO reduces only from 15.7%
to ~14% ATE regardless of loop weight. The classic fix (ORB-SLAM's
essential-graph optimization, Strasdat et al. "Scale Drift-Aware Large
Scale Monocular SLAM") is a pose graph over Sim(3): each node carries
(R_i, t_i, log s_i), chain edges measure relative similarities with
s_meas = 1, and the optimizer distributes the loop's scale discrepancy
along the chain.

Convention: node i maps world -> cam by x = s_i * (R_i X) + t_i. The
relative similarity of edge (i, j) is

    R_ij = R_j R_i^T,  s_ij = s_j / s_i,
    t_ij = t_j - s_ij * R_ij t_i,

so a measured SE(3) odometry edge is (rel_rvec, rel_tvec, rel_log_s=0).

Measurement model (the round-4 fix for the inert scale channel): the
edge constrains S_ij == S_meas with

    S_meas = (exp(rel_log_s), R(rel_rvec), exp(rel_log_s) * rel_tvec)

i.e. ``rel_tvec`` is expressed in node i's scale units and the measured
scale ratio maps it into node j's units. Chain edges measured from the
drifted estimates carry rel_log_s = 0 and are untouched; a LOOP edge
built from a metric archive-PnP pose carries the measured accumulated
scale drift (log of the drifted-estimate/metric translation-norm ratio,
:func:`measured_rel_log_s`), which makes the desired solution — rigid
poses at ground truth, t_i = s_i * t_i^true, s_i = the drift ramp —
zero the loop's rot/trans/scale rows exactly, leaving only the soft
chain scale-prior rows (log per-edge drift each) to distribute the
discrepancy along the chain (Strasdat et al. scale-drift-aware PGO /
ORB-SLAM essential graph, where computeSim3 likewise hands the loop
edge a MEASURED scale). Without the measured loop scale the scale rows
form a consistent all-zero system and the channel is inert — the
round-3 defect.
Same TPU-first shape as models/pose_graph.py: fixed-capacity masked edge
list, autodiff per-edge Jacobians (7-dim blocks), segment-sum normal
equations, damped GN in lax.fori_loop, node-0 gauge fixed (pose AND
scale — monocular gauge freedom is similarity, not rigid). Dense
(7N, 7N) solve: the odometry trajectories this serves are hundreds of
nodes; the matrix-free CG treatment of pose_graph.py transfers verbatim
if thousands are ever needed.
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


class Sim3Poses(NamedTuple):
    rvecs: jax.Array   # (N, 3)
    tvecs: jax.Array   # (N, 3)
    log_s: jax.Array   # (N,)


class Sim3Edges(NamedTuple):
    """Fixed-capacity relative-similarity constraint list.

    ``metric`` marks edges whose rel_tvec is a METRIC measurement (an
    archive-PnP loop constraint): their translation row compares the
    DE-SCALED relative translation t_ij * exp(-(s_j - s_i)) against the
    measurement, so the optimizer itself determines the accumulated
    scale at the loop endpoint — no external scale estimator involved —
    and their scale-prior row is dropped. Non-metric (odometry chain)
    edges, whose rel_tvec is expressed in the drifted estimate's own
    units, keep the round-3 rows: raw translation difference (mapped
    through exp(rel_log_s)) plus the soft scale prior (s_j - s_i) -
    rel_log_s that distributes loop scale discrepancy along the chain.
    """

    i: jax.Array          # (E,) i32
    j: jax.Array          # (E,) i32
    rel_rvec: jax.Array   # (E, 3)
    rel_tvec: jax.Array   # (E, 3)
    rel_log_s: jax.Array  # (E,) measured log(s_j / s_i) (0 for odometry)
    weight: jax.Array     # (E,) f32 (0 = invalid slot)
    metric: jax.Array     # (E,) f32 1.0 = metric loop edge, 0.0 = chain


def se3_to_sim3_poses(rvecs: jax.Array, tvecs: jax.Array) -> Sim3Poses:
    return Sim3Poses(
        rvecs=rvecs, tvecs=tvecs,
        log_s=jnp.zeros(rvecs.shape[0], jnp.float32),
    )


def sim3_to_se3_poses(p: Sim3Poses) -> tuple[jax.Array, jax.Array]:
    """Back to world->cam SE(3): x = s(RX) + t = s(RX + t/s) — the
    rigid pose is (R, t/s); the per-node scale has been absorbed into
    the (now metrically consistent) trajectory."""
    return p.rvecs, p.tvecs / jnp.exp(p.log_s)[:, None]


def _edge_residual(ri, ti, si, rj, tj, sj, rel_r, rel_t, rel_ls, metric):
    """(7,) residual; rows depend on the edge's measurement frame.

    Chain (metric=0):  [log(R_m^T R_ij); t_ij - e^ls t_m; (sj-si) - ls]
    Metric (metric=1): [log(R_m^T R_ij); e^-(sj-si) t_ij - t_m; 0]

    The metric translation row compares the DE-SCALED relative
    translation against the measurement, so the scale-absorbing
    solution (t_i = s_i t_i_true, s_i = the drift ramp) zeroes it
    exactly and the loop endpoint's scale is determined by the
    optimization, not by an external (path-averaged, biased) estimate.
    See the class docstring of :class:`Sim3Edges`.
    """
    Ri, Rj = rodrigues(ri), rodrigues(rj)
    R_rel = Rj @ Ri.T
    s_rel = jnp.exp(sj - si)
    t_rel = tj - s_rel * (R_rel @ ti)
    e_rot = rotation_log(rodrigues(rel_r).T @ R_rel)
    e_t_chain = t_rel - jnp.exp(rel_ls) * rel_t
    e_t_metric = t_rel / s_rel - rel_t
    e_t = (1.0 - metric) * e_t_chain + metric * e_t_metric
    e_s = (1.0 - metric) * ((sj - si) - rel_ls)
    return jnp.concatenate([e_rot, e_t, e_s[None]])


def measured_rel_log_s(
    rvecs: jax.Array,
    tvecs: jax.Array,
    i: jax.Array,
    j: jax.Array,
    rel_tvec: jax.Array,
    max_abs: float = 2.0,
    eps: float = 1e-6,
) -> jax.Array:
    """Per-edge measured scale ratio log(s_j / s_i) from translation norms.

    The current (drifted) estimates' implied relative translation for
    edge (i, j) has length scaled by the accumulated drift s_j; a metric
    measurement (archive PnP) has the true length. Their log-ratio is
    the edge's measured rel_log_s. For chain edges, whose rel_tvec was
    measured FROM the estimates, the ratio is exactly 1 -> 0, so this is
    safe to apply uniformly to every edge of a pose graph. Guarded: near
    -zero norms (pure rotation / padding slots) return 0, and the result
    is clamped to +-``max_abs`` (a 7.4x scale drift) so one degenerate
    PnP translation cannot inject an absurd constraint.
    """
    from sift_parallel_optimization_tpu.models.pose_graph import (
        relative_pose,
    )

    rr, rt = jax.vmap(relative_pose)(
        rvecs[i], tvecs[i], rvecs[j], tvecs[j]
    )
    del rr
    n_est = jnp.linalg.norm(rt, axis=-1)
    n_meas = jnp.linalg.norm(rel_tvec, axis=-1)
    ok = (n_est > eps) & (n_meas > eps)
    ls = jnp.log(jnp.maximum(n_est, eps) / jnp.maximum(n_meas, eps))
    return jnp.where(ok, jnp.clip(ls, -max_abs, max_abs), 0.0)


def sim3_residuals(poses: Sim3Poses, edges: Sim3Edges) -> jax.Array:
    with jax.default_matmul_precision("highest"):
        r = jax.vmap(_edge_residual)(
            poses.rvecs[edges.i], poses.tvecs[edges.i],
            poses.log_s[edges.i],
            poses.rvecs[edges.j], poses.tvecs[edges.j],
            poses.log_s[edges.j],
            edges.rel_rvec, edges.rel_tvec, edges.rel_log_s,
            edges.metric,
        )
    return r * jnp.sqrt(jnp.maximum(edges.weight, 0.0))[:, None]


def sim3_rms(poses: Sim3Poses, edges: Sim3Edges) -> jax.Array:
    r = sim3_residuals(poses, edges)
    n = jnp.maximum((edges.weight > 0).sum(), 1)
    return jnp.sqrt(jnp.sum(r * r) / n)


def _f32_precision(fn):
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


def _edge_jacobians(poses: Sim3Poses, edges: Sim3Edges):
    """ji/jj (E, 7, 7) weighted, node-0 gauge-masked; r (E, 7)."""

    def one(ri, ti, si, rj, tj, sj, rel_r, rel_t, rel_ls, metric, w):
        def f(theta):
            return _edge_residual(
                theta[:3], theta[3:6], theta[6],
                theta[7:10], theta[10:13], theta[13],
                rel_r, rel_t, rel_ls, metric,
            ) * jnp.sqrt(jnp.maximum(w, 0.0))

        theta = jnp.concatenate(
            [ri, ti, si[None], rj, tj, sj[None]]
        )
        jac = jax.jacfwd(f)(theta)            # (7, 14)
        return jac[:, :7], jac[:, 7:], f(theta)

    ji, jj, r = jax.vmap(one)(
        poses.rvecs[edges.i], poses.tvecs[edges.i], poses.log_s[edges.i],
        poses.rvecs[edges.j], poses.tvecs[edges.j], poses.log_s[edges.j],
        edges.rel_rvec, edges.rel_tvec, edges.rel_log_s, edges.metric,
        edges.weight,
    )
    keep_i = (edges.i != 0)[:, None, None].astype(ji.dtype)
    keep_j = (edges.j != 0)[:, None, None].astype(jj.dtype)
    return ji * keep_i, jj * keep_j, r


@_f32_precision
def sim3_step(
    poses: Sim3Poses, edges: Sim3Edges, damping: float = 1e-3
) -> Sim3Poses:
    """One damped Gauss-Newton step (dense (7N, 7N) solve, node-0 gauge)."""
    N = poses.rvecs.shape[0]
    ji, jj, r = _edge_jacobians(poses, edges)

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
    w_ij = jnp.einsum("eab,eac->ebc", ji, jj)
    cross = jax.ops.segment_sum(
        w_ij.reshape(-1, 49), edges.i * N + edges.j, N * N
    ).reshape(N, N, 7, 7)

    h = cross + cross.transpose(1, 0, 3, 2)
    h = h.at[jnp.arange(N), jnp.arange(N)].add(hii + hjj)
    hd = h[jnp.arange(N), jnp.arange(N)]
    d = jnp.diagonal(hd, axis1=-2, axis2=-1)
    h = h.at[jnp.arange(N), jnp.arange(N)].add(
        (damping * d + 1e-6)[..., None] * jnp.eye(7)
    )
    hd_dense = h.transpose(0, 2, 1, 3).reshape(7 * N, 7 * N)
    m0 = jnp.concatenate([jnp.zeros(7), jnp.ones(7 * (N - 1))])
    hd_dense = hd_dense * m0[:, None] * m0[None, :] + jnp.diag(1.0 - m0)
    b = b.at[0].set(0.0)
    dx = jnp.linalg.solve(hd_dense, b.reshape(-1)).reshape(N, 7)
    return Sim3Poses(
        rvecs=poses.rvecs + dx[:, :3],
        tvecs=poses.tvecs + dx[:, 3:6],
        log_s=poses.log_s + dx[:, 6],
    )


def optimize_sim3_graph(
    poses: Sim3Poses,
    edges: Sim3Edges,
    n_iters: int = 15,
    damping: float = 1e-4,
) -> Sim3Poses:
    """Damped GN iterations inside lax.fori_loop (static shapes)."""

    def body(_, p):
        return sim3_step(p, edges, damping)

    return lax.fori_loop(0, n_iters, body, poses)
