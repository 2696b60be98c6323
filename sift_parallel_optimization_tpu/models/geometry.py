"""Multi-view geometry primitives, batched for TPU.

North-star extension (BASELINE.json configs 4-5); no analogue in the
reference. Everything is batched linear algebra — small per-item SVDs and
solves vmapped over points/hypotheses so XLA lowers them to batched kernels.

Conventions: world-to-camera pose (R, t): x_cam = R @ x_world + t.
Pixels via intrinsics K (3x3, zero skew). Rotations stored as 3-vectors
(axis-angle, Rodrigues) wherever they are optimized, as matrices elsewhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _f32_precision(fn):
    """Run ``fn`` with HIGHEST matmul precision.

    TPU's default matmul precision is bf16, which is catastrophic for the
    geometry stack (SVDs, triangulation, normal-equation solves): the SfM
    pipeline produced thousands-of-pixels reprojection errors until these
    paths were pinned to f32.
    """
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


# ---------------------------------------------------------------------------
# Rotations (axis-angle <-> matrix)
# ---------------------------------------------------------------------------


@_f32_precision
def rodrigues(w: jax.Array) -> jax.Array:
    """(..., 3) axis-angle -> (..., 3, 3) rotation matrix (exp map).

    Taylor-safe near zero so it is differentiable everywhere.

    Pinned to HIGHEST matmul precision: the K @ K term otherwise runs
    bf16 on TPU and every residual evaluated through an unpinned caller
    (rms_error, the LM accept test) inherits ~0.1 px of noise — measured
    on chip as a 0.12 px BA convergence floor vs 7e-5 when pinned.
    """
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)  # (..., 1)
    small = theta < 1e-6
    th = jnp.where(small, 1.0, theta)
    k = w / th
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zero, -kz, ky], -1),
            jnp.stack([kz, zero, -kx], -1),
            jnp.stack([-ky, kx, zero], -1),
        ],
        -2,
    )
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    R = eye + s * K + (1 - c) * (K @ K)
    # Near zero: I + hat(w) (first order, keeps gradients exact).
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    Ws = jnp.stack(
        [
            jnp.stack([zero, -wz, wy], -1),
            jnp.stack([wz, zero, -wx], -1),
            jnp.stack([-wy, wx, zero], -1),
        ],
        -2,
    )
    return jnp.where(small[..., None], eye + Ws, R)


def rotation_log(R: jax.Array) -> jax.Array:
    """(3, 3) rotation -> (3,) axis-angle (log map), robust at theta ~ pi.

    The standard v * theta / (2 sin theta) formula degenerates as
    theta -> pi (the antisymmetric part vanishes); there the axis is
    recovered from the dominant column of R + I instead.
    """
    v = jnp.stack(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )
    nv = jnp.linalg.norm(v)  # = 2 sin(theta), exact from matrix entries
    cos_t = jnp.clip((jnp.trace(R) - 1) / 2, -1.0, 1.0)
    # atan2(|v|/2, cos) is well conditioned everywhere, unlike arccos whose
    # f32 error near +-1 gets amplified by theta/(2 sin theta).
    theta = jnp.arctan2(nv / 2.0, cos_t)
    # w = v * theta / |v|; as theta -> 0 the ratio -> 1/2 (continuous).
    ratio = jnp.where(nv > 1e-6, theta / jnp.maximum(nv, 1e-12), 0.5)
    w_general = v * ratio
    # Near pi the antisymmetric part vanishes and v carries no direction:
    # recover the axis from R + I = 2 axis axis^T (+ O(pi - theta) error,
    # so keep this branch NARROW). With the atan2 form above, the general
    # formula's direction error is ~eps/(2*gap); the crossover where both
    # errors match is gap ~ sqrt(eps) ~ 3e-4.
    B = R + jnp.eye(3)
    k = jnp.argmax(jnp.diagonal(B))
    col = B[:, k]
    axis = col / jnp.maximum(jnp.linalg.norm(col), 1e-12)
    sign = jnp.where(jnp.dot(axis, v) < 0, -1.0, 1.0)
    w_pi = axis * theta * sign
    return jnp.where(theta > jnp.pi - 3e-4, w_pi, w_general)


# ---------------------------------------------------------------------------
# Projection
# ---------------------------------------------------------------------------


class Camera(NamedTuple):
    rvec: jax.Array  # (3,) axis-angle world->cam
    tvec: jax.Array  # (3,)

    def matrix(self, K: jax.Array) -> jax.Array:
        """(3, 4) projection matrix P = K [R | t] (HIGHEST precision —
        see rodrigues)."""
        R = rodrigues(self.rvec)
        with jax.default_matmul_precision("highest"):
            return K @ jnp.concatenate([R, self.tvec[:, None]], axis=1)


@_f32_precision
def project(
    pts: jax.Array, rvec: jax.Array, tvec: jax.Array, K: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """(N, 3) world pts -> ((N, 2) pixels, (N,) depth).

    Pinned to HIGHEST matmul precision (see rodrigues): this is the
    residual kernel of every solver and every accuracy gate.
    """
    R = rodrigues(rvec)
    pc = pts @ R.T + tvec
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    uv1 = (pc / zs[..., None]) @ K.T
    return uv1[..., :2], z


# ---------------------------------------------------------------------------
# Triangulation
# ---------------------------------------------------------------------------


@_f32_precision
def triangulate(
    P1: jax.Array, P2: jax.Array, p1: jax.Array, p2: jax.Array
) -> jax.Array:
    """Batched DLT triangulation: (3,4) x2 projections, (N,2) x2 pixels ->
    (N, 3) world points (homogeneous SVD null vector per correspondence)."""

    def one(u1, u2):
        a = jnp.stack(
            [
                u1[0] * P1[2] - P1[0],
                u1[1] * P1[2] - P1[1],
                u2[0] * P2[2] - P2[0],
                u2[1] * P2[2] - P2[1],
            ]
        )
        _, _, vt = jnp.linalg.svd(a)
        x = vt[-1]
        return x[:3] / jnp.where(jnp.abs(x[3]) > 1e-12, x[3], 1e-12)

    return jax.vmap(one)(p1, p2)


# ---------------------------------------------------------------------------
# Essential matrix & relative pose
# ---------------------------------------------------------------------------


def essential_from_fundamental(F: jax.Array, K: jax.Array) -> jax.Array:
    return K.T @ F @ K


def decompose_essential(E: jax.Array):
    """E -> 4 candidate (R, t): (4, 3, 3) rotations, (4, 3) translations."""
    u, _, vt = jnp.linalg.svd(E)
    # Ensure proper rotations.
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


@_f32_precision
def recover_pose(
    E: jax.Array,
    p1: jax.Array,
    p2: jax.Array,
    K: jax.Array,
    mask: jax.Array,
):
    """Pick the (R, t) candidate with the most points in front of BOTH
    cameras (cheirality check via batched triangulation). Camera 1 is
    identity; returns (R, t, points3d, front_mask) for the winner. |t| = 1
    (monocular scale is unobservable)."""
    Rs, ts = decompose_essential(E)
    P1 = K @ jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)

    def score(R, t):
        P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)
        X = triangulate(P1, P2, p1, p2)
        z1 = X[:, 2]
        z2 = (X @ R.T + t)[:, 2]
        front = (z1 > 0) & (z2 > 0) & mask
        return front.sum(), X, front

    counts, Xs, fronts = jax.vmap(score)(Rs, ts)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], Xs[best], fronts[best]


# ---------------------------------------------------------------------------
# PnP (camera from 2D-3D correspondences)
# ---------------------------------------------------------------------------


@_f32_precision
def pnp_dlt(
    pts3d: jax.Array, pts2d: jax.Array, K: jax.Array, w: jax.Array
) -> Camera:
    """Weighted DLT PnP: (N,3) world, (N,2) pixels, (N,) weights -> Camera.

    Solves for P (3x4) as the null vector of the weighted design matrix,
    then factors K^-1 P into [R|t] with orthogonal Procrustes. Weights make
    it RANSAC-friendly (outliers get w=0) with static shapes.
    """
    x = jnp.concatenate([pts3d, jnp.ones_like(pts3d[:, :1])], -1)  # (N,4)
    u, v = pts2d[:, 0], pts2d[:, 1]
    z = jnp.zeros_like(x)
    rows_u = jnp.concatenate([x, z, -u[:, None] * x], -1)   # (N, 12)
    rows_v = jnp.concatenate([z, x, -v[:, None] * x], -1)
    a = jnp.concatenate([rows_u, rows_v], 0)                # (2N, 12)
    ww = jnp.concatenate([w, w], 0)
    ata = jnp.einsum("ki,k,kj->ij", a, ww, a)
    _, _, vt = jnp.linalg.svd(ata)
    P = vt[-1].reshape(3, 4)
    M = jnp.linalg.solve(K, P[:, :3])
    # The null vector's sign is arbitrary: normalize so M = s*R with s > 0
    # (det(M) = s^3), which also settles cheirality for points in front.
    sgn = jnp.sign(jnp.linalg.det(M))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    P = P * sgn
    M = M * sgn
    # Procrustes: nearest rotation to M; scale from the singular values.
    um, sm, vmt = jnp.linalg.svd(M)
    d = jnp.sign(jnp.linalg.det(um) * jnp.linalg.det(vmt))
    diag = jnp.stack([jnp.ones(()), jnp.ones(()), d])
    R = (um * diag[None, :]) @ vmt
    scale = jnp.sum(sm * diag) / 3.0
    t = jnp.linalg.solve(K, P[:, 3]) / jnp.where(
        jnp.abs(scale) > 1e-12, scale, 1e-12
    )
    cam = Camera(rvec=rotation_log(R), tvec=t)
    return refine_pose(cam, pts3d, pts2d, K, w, n_iters=3)


@_f32_precision
def refine_pose(
    cam: Camera,
    pts3d: jax.Array,
    pts2d: jax.Array,
    K: jax.Array,
    w: jax.Array,
    n_iters: int = 3,
    damping: float = 1e-6,
) -> Camera:
    """Gauss-Newton pose-only refinement (weighted reprojection)."""

    def res(theta):
        uv, _ = project(pts3d, theta[:3], theta[3:], K)
        return ((uv - pts2d) * w[:, None]).reshape(-1)

    def step(_, theta):
        j = jax.jacfwd(res)(theta)               # (2N, 6)
        r = res(theta)
        h = j.T @ j + damping * jnp.eye(6)
        return theta - jnp.linalg.solve(h, j.T @ r)

    theta = jax.lax.fori_loop(
        0, n_iters, step, jnp.concatenate([cam.rvec, cam.tvec])
    )
    return Camera(rvec=theta[:3], tvec=theta[3:])


def reprojection_error(
    cam: Camera, pts3d: jax.Array, pts2d: jax.Array, K: jax.Array
) -> jax.Array:
    """(N,) pixel reprojection distances."""
    uv, _ = project(pts3d, cam.rvec, cam.tvec, K)
    return jnp.linalg.norm(uv - pts2d, axis=-1)
