"""Trajectory alignment + ATE metrics (the BASELINE.json accuracy gate).

ATE (absolute trajectory error) is computed after Umeyama Sim(3) alignment,
the standard protocol for monocular pipelines whose scale is unobservable
(TUM/KITTI-style evaluation referenced by BASELINE.json).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def camera_centers(rvecs: jax.Array, tvecs: jax.Array) -> jax.Array:
    """(C, 3) camera centers from world->cam poses: c = -R^T t."""
    from sift_parallel_optimization_tpu.models.geometry import rodrigues

    R = rodrigues(rvecs)                      # (C, 3, 3)
    return -jnp.einsum("cij,ci->cj", R, tvecs)


def _f32_precision(fn):
    """HIGHEST matmul precision wrapper (see models/geometry.py)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


@_f32_precision
def umeyama_alignment(
    src: jax.Array, dst: jax.Array, with_scale: bool = True
):
    """Least-squares similarity transform: s * R @ src + t ~= dst.

    (N, 3) point sets. Returns (s, R, t). Umeyama 1991 closed form.
    """
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / src.shape[0]            # (3, 3)
    u, d, vt = jnp.linalg.svd(cov)
    sgn = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    diag = jnp.stack([jnp.ones(()), jnp.ones(()), sgn])
    R = (u * diag[None, :]) @ vt
    var_s = (xs * xs).sum() / src.shape[0]
    s = jnp.where(
        with_scale,
        jnp.sum(d * diag) / jnp.maximum(var_s, 1e-12),
        1.0,
    )
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(
    est_centers: jax.Array, gt_centers: jax.Array, with_scale: bool = True
) -> jax.Array:
    """RMSE of aligned camera centers (the headline ATE number)."""
    s, R, t = umeyama_alignment(est_centers, gt_centers, with_scale)
    aligned = s * est_centers @ R.T + t
    return jnp.sqrt(((aligned - gt_centers) ** 2).sum(-1).mean())
