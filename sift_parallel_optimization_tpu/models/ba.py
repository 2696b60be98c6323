"""Gauss-Newton bundle adjustment with dense Schur complement, on device.

North-star extension (BASELINE.json configs 4-5); no analogue in the
reference. The classic sparse-BA structure is reshaped for TPU:

* Observations live in a FIXED-capacity structure-of-arrays with a valid
  mask (invalid slots contribute zero residual/Jacobian) — static shapes.
* Per-observation 2x6 / 2x3 Jacobians come from `jax.jacfwd` of the single-
  observation residual, vmapped — XLA batches them; no hand-derived chains.
* The normal equations are assembled with `segment_sum` (camera and point
  diagonal blocks) and a scatter-add into a DENSE (C, P, 6, 3) camera-point
  cross block. Dense-blocked beats sparse here: C*P*18 floats is megabytes
  for the target scene sizes, and every downstream contraction becomes an
  einsum the MXU executes directly — no indirection, no sorting.
* The reduced camera system (Schur complement S = Hcc - W Hpp^-1 W^T) is a
  couple of einsums + one (6C, 6C) dense solve; landmarks come back by
  batched 3x3 back-substitution. This exact assembly is what
  parallel/ba.py distributes: observations shard over the mesh and the
  block sums become psums (reduce_scatter camera blocks, all_gather
  landmark updates — BASELINE.json north star).

Iteration is damped Gauss-Newton (fixed lambda, fixed iteration count)
inside `lax.fori_loop` — no data-dependent control flow under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from sift_parallel_optimization_tpu.models.geometry import project


class Observations(NamedTuple):
    """Fixed-capacity observation list (the BA 'measurement graph')."""

    cam_idx: jax.Array  # (M,) i32
    pt_idx: jax.Array   # (M,) i32
    uv: jax.Array       # (M, 2) f32 measured pixels
    valid: jax.Array    # (M,) bool

    def count(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32))


class BAState(NamedTuple):
    rvecs: jax.Array   # (C, 3) axis-angle world->cam
    tvecs: jax.Array   # (C, 3)
    points: jax.Array  # (P, 3)


def _residual_one(rvec, tvec, pt, uv, K):
    uvp, _ = project(pt[None], rvec, tvec, K)
    return uvp[0] - uv  # (2,)


def residuals(state: BAState, obs: Observations, K: jax.Array) -> jax.Array:
    """(M, 2) reprojection residuals, zeroed on invalid slots."""
    r = jax.vmap(_residual_one, in_axes=(0, 0, 0, 0, None))(
        state.rvecs[obs.cam_idx],
        state.tvecs[obs.cam_idx],
        state.points[obs.pt_idx],
        obs.uv,
        K,
    )
    return jnp.where(obs.valid[:, None], r, 0.0)


def rms_error(state: BAState, obs: Observations, K: jax.Array) -> jax.Array:
    r = residuals(state, obs, K)
    n = jnp.maximum(obs.count(), 1)
    return jnp.sqrt(jnp.sum(r * r) / n)


def _obs_jacobians(state: BAState, obs: Observations, K: jax.Array):
    """Per-observation Jacobians: Jc (M, 2, 6), Jp (M, 2, 3), r (M, 2)."""

    def one(rvec, tvec, pt, uv):
        def f_cam(c):
            return _residual_one(c[:3], c[3:], pt, uv, K)

        def f_pt(p):
            return _residual_one(rvec, tvec, p, uv, K)

        cam = jnp.concatenate([rvec, tvec])
        r = _residual_one(rvec, tvec, pt, uv, K)
        return jax.jacfwd(f_cam)(cam), jax.jacfwd(f_pt)(pt), r

    jc, jp, r = jax.vmap(one)(
        state.rvecs[obs.cam_idx],
        state.tvecs[obs.cam_idx],
        state.points[obs.pt_idx],
        obs.uv,
    )
    w = obs.valid[:, None, None].astype(jnp.float32)
    return jc * w, jp * w, jnp.where(obs.valid[:, None], r, 0.0)


def _huber_weights(r: jax.Array, delta: float) -> jax.Array:
    """(M,) IRLS weights for the Huber loss on residual norms."""
    n = jnp.linalg.norm(r, axis=-1)
    return jnp.where(n <= delta, 1.0, delta / jnp.maximum(n, 1e-12))


class NormalBlocks(NamedTuple):
    """Assembled normal-equation blocks (the distributable intermediate).

    In parallel/ba.py each device assembles these from its observation
    shard and a single psum over the pytree yields the global system —
    the sum over observations commutes with everything downstream.
    """

    hcc: jax.Array  # (C, 6, 6) camera diagonal blocks
    hpp: jax.Array  # (P, 3, 3) point diagonal blocks
    bc: jax.Array   # (C, 6)
    bp: jax.Array   # (P, 3)
    w: jax.Array    # (C, P, 6, 3) camera-point cross blocks


def _f32_precision(fn):
    """HIGHEST matmul precision wrapper (see models/geometry.py)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


@_f32_precision
def assemble_normal_blocks(
    state: BAState,
    obs: Observations,
    K: jax.Array,
    huber_delta: float | None = None,
    fix_first_cam: bool = True,
) -> NormalBlocks:
    """Linearize all observations and reduce them into block form."""
    C = state.rvecs.shape[0]
    P = state.points.shape[0]
    jc, jp, r = _obs_jacobians(state, obs, K)       # (M,2,6) (M,2,3) (M,2)
    if huber_delta is not None:
        hw = _huber_weights(r, huber_delta)[:, None, None]
        jc = jc * jnp.sqrt(hw)
        jp = jp * jnp.sqrt(hw)
        r = r * jnp.sqrt(hw[:, :, 0])

    # Gauge fixing: freeze camera 0 (zero its Jacobian) to remove the
    # 7-dof gauge freedom (6 pose + scale is handled by the prior scene).
    if fix_first_cam:
        keep = (obs.cam_idx != 0)[:, None, None].astype(jc.dtype)
        jc = jc * keep

    hcc = jax.ops.segment_sum(
        jnp.einsum("mik,mil->mkl", jc, jc), obs.cam_idx, C
    )                                               # (C, 6, 6)
    hpp = jax.ops.segment_sum(
        jnp.einsum("mik,mil->mkl", jp, jp), obs.pt_idx, P
    )                                               # (P, 3, 3)
    bc = -jax.ops.segment_sum(
        jnp.einsum("mik,mi->mk", jc, r), obs.cam_idx, C
    )                                               # (C, 6)
    bp = -jax.ops.segment_sum(
        jnp.einsum("mik,mi->mk", jp, r), obs.pt_idx, P
    )                                               # (P, 3)

    # Dense camera-point cross blocks W[c, p] = sum_obs Jc^T Jp, assembled
    # as a segment_sum over the flattened (cam, pt) index — 8x faster on
    # TPU than the equivalent 2-D scatter-add (`.at[cam, pt].add`).
    w_obs = jnp.einsum("mik,mil->mkl", jc, jp)      # (M, 6, 3)
    seg = obs.cam_idx * P + obs.pt_idx
    w = jax.ops.segment_sum(
        w_obs.reshape(-1, 18), seg, C * P
    ).reshape(C, P, 6, 3)
    return NormalBlocks(hcc=hcc, hpp=hpp, bc=bc, bp=bp, w=w)


@_f32_precision
def solve_schur(
    blocks: NormalBlocks,
    damping: float = 1e-3,
    fix_first_cam: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Schur-complement solve of the block system -> (delta_c, delta_p)."""
    hcc, hpp, bc, bp, w = blocks
    C = hcc.shape[0]

    # Marquardt-scaled damping: lambda * diag(H) + absolute floor. Pure
    # identity damping leaves the monocular scale-gauge direction of the
    # reduced system near-singular relative to the ~1e6-magnitude
    # reprojection blocks, which overwhelms a float32 solve; scaling by
    # the diagonal bounds the condition number by ~1/damping.
    def damp(h):
        d = jnp.diagonal(h, axis1=-2, axis2=-1)
        k = h.shape[-1]
        return h + (damping * d + 1e-6)[..., None] * jnp.eye(k)

    hcc = damp(hcc)
    hpp = damp(hpp)

    hpp_inv = jnp.linalg.inv(hpp)                   # (P, 3, 3) batched
    y = jnp.einsum("cpik,pkl->cpil", w, hpp_inv)    # (C, P, 6, 3)

    # Reduced camera system: S = Hcc - Y W^T, b = bc - Y bp.
    s = -jnp.einsum("cpik,dplk->cdil", y, w)        # (C, C, 6, 6)
    s = s.at[jnp.arange(C), jnp.arange(C)].add(hcc)
    b = bc - jnp.einsum("cpik,pk->ci", y, bp)       # (C, 6)

    s_dense = s.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
    # Freeze camera 0 rows/cols via identity block.
    if fix_first_cam:
        m0 = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (C - 1))])
        s_dense = s_dense * m0[:, None] * m0[None, :] + jnp.diag(1.0 - m0)
        b = b.at[0].set(0.0)
    delta_c = jnp.linalg.solve(s_dense, b.reshape(-1)).reshape(C, 6)

    # Back-substitution for landmarks.
    wt_dc = jnp.einsum("cpik,ci->pk", w, delta_c)   # (P, 3)
    delta_p = jnp.einsum("pkl,pl->pk", hpp_inv, bp - wt_dc)
    return delta_c, delta_p


def apply_deltas(
    state: BAState, delta_c: jax.Array, delta_p: jax.Array
) -> BAState:
    return BAState(
        rvecs=state.rvecs + delta_c[:, :3],
        tvecs=state.tvecs + delta_c[:, 3:],
        points=state.points + delta_p,
    )


def ba_step(
    state: BAState,
    obs: Observations,
    K: jax.Array,
    damping: float = 1e-3,
    huber_delta: float | None = None,
    fix_first_cam: bool = True,
) -> BAState:
    """One damped Gauss-Newton step with Schur-complement elimination."""
    blocks = assemble_normal_blocks(
        state, obs, K, huber_delta=huber_delta, fix_first_cam=fix_first_cam
    )
    delta_c, delta_p = solve_schur(
        blocks, damping=damping, fix_first_cam=fix_first_cam
    )
    return apply_deltas(state, delta_c, delta_p)


def bundle_adjust(
    state: BAState,
    obs: Observations,
    K: jax.Array,
    n_iters: int = 10,
    damping: float = 1e-3,
    huber_delta: float | None = None,
    fix_first_cam: bool = True,
) -> BAState:
    """Run ``n_iters`` damped Gauss-Newton steps (static trip count)."""

    def body(_, st):
        return ba_step(
            st, obs, K,
            damping=damping,
            huber_delta=huber_delta,
            fix_first_cam=fix_first_cam,
        )

    return lax.fori_loop(0, n_iters, body, state)
