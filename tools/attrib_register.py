"""On-chip sub-attribution of register_frame's pieces (scan-chained)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sift_parallel_optimization_tpu.models.frontend import (
    extract_features,
    sift_config,
)
from sift_parallel_optimization_tpu.models.sfm import (
    empty_map,
    init_two_view,
    ransac_pnp,
    register_frame,
)
from sift_parallel_optimization_tpu.models.matching import (
    _sample_indices,
    match_descriptors,
    matched_points,
)
from sift_parallel_optimization_tpu.models.geometry import (
    Camera,
    pnp_dlt,
    project,
    refine_pose,
    reprojection_error,
    rodrigues,
    triangulate,
)
from sift_parallel_optimization_tpu.utils import native

size, W, B = 256, 6, 128
focal = float(size)
cfg = sift_config(size)
K = jnp.array(
    [[focal, 0, size / 2], [0, focal, size / 2], [0, 0, 1.0]], jnp.float32
)
fe = jax.jit(lambda x: extract_features(x, cfg, B * 2, dual_orientation=True))
rvs = np.stack([[0.0, 0.02 * i, 0.0] for i in range(3)], 0)
tvs = np.stack([[-0.3 * i, 0.0, 0.03 * i] for i in range(3)], 0)
feats = [
    fe(jnp.asarray(native.render_frame(
        size, rvs[i].astype(np.float32), tvs[i].astype(np.float32),
        focal, seed=2)))
    for i in range(3)
]
key = jax.random.key(0)
m0 = empty_map(W, B, max_loops=0)
m0, used0 = init_two_view(key, feats[0], feats[1], K, m0, B)

f_cur, f_prev = feats[2], feats[1]
uv = jnp.stack([f_cur.keypoints.x, f_cur.keypoints.y], -1)


def chain_ms(step, label, x0):
    """step: x (f32 scalar) -> f32 scalar-ish perturbation source."""
    def chain(n):
        @jax.jit
        def run(x):
            def body(c, _):
                return step(c), None
            out, _ = lax.scan(body, x, None, length=n)
            return out
        float(run(x0))
        return run

    def total_ms(fn):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(fn(x0))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    lo, hi = 8, 32
    t_hi = total_ms(chain(hi))
    if t_hi < 60.0:
        scale = int(60.0 / max(t_hi, 1e-3)) + 1
        lo, hi = lo * scale, hi * scale
    ms = max((total_ms(chain(hi)) - total_ms(chain(lo))) / (hi - lo), 1e-6)
    print(f"{label:34s} {ms:8.4f} ms", flush=True)
    return ms


# 1) 2D-3D matching (K=256 vs P=768 descriptors)
def s_match3(x):
    m3 = match_descriptors(
        f_cur.descriptors + x * 1e-20, m0.pt_desc,
        f_cur.keypoints.valid, m0.pt_valid,
    )
    return x + 1e-20 * m3.similarity.sum()


# 2) full ransac_pnp
pts3d0 = m0.points[jnp.arange(uv.shape[0]) % m0.points.shape[0]]
mask0 = jnp.ones(uv.shape[0], bool)


def s_pnp(x):
    cam, inl, n = ransac_pnp(key, pts3d0 + x * 1e-20, uv, mask0, K)
    return x + 1e-20 * (cam.rvec.sum() + n)


# 3) sample + DLT only (128 hypotheses)
def s_dlt(x):
    idx = _sample_indices(key, mask0, 128, 6)
    p3 = (pts3d0 + x * 1e-20)[idx]
    p2 = uv[idx]

    def solve(p3i, p2i):
        cam = pnp_dlt(p3i, p2i, K, jnp.ones(6))
        return jnp.concatenate([cam.rvec, cam.tvec])

    thetas = jax.vmap(solve)(p3, p2)
    return x + 1e-20 * thetas.sum()


# 4) hypothesis scoring only
thetas0 = jnp.tile(jnp.asarray([0.01, 0.02, 0.0, 0.1, 0.0, 1.0]), (128, 1))


def s_score(x):
    def score(theta):
        uvp, z = project(pts3d0 + x * 1e-20, theta[:3], theta[3:], K)
        err = jnp.linalg.norm(uvp - uv, axis=-1)
        return (err < 3.0) & (z > 0) & mask0

    inl = jax.vmap(score)(thetas0)
    return x + 1e-20 * inl.sum()


# 5) refine_pose (5 GN iters on K=256 pts)
cam0 = Camera(rvec=jnp.asarray([0.01, 0.02, 0.0]), tvec=jnp.asarray([0.1, 0.0, 1.0]))


def s_refine(x):
    cam = refine_pose(
        Camera(cam0.rvec + x * 1e-20, cam0.tvec), pts3d0, uv, K,
        mask0.astype(jnp.float32), n_iters=5,
    )
    return x + 1e-20 * cam.rvec.sum()


# 6) 2D-2D match (256 x 256)
def s_match2(x):
    m2 = match_descriptors(
        f_prev.descriptors + x * 1e-20, f_cur.descriptors,
        f_prev.keypoints.valid, f_cur.keypoints.valid,
    )
    return x + 1e-20 * m2.similarity.sum()


# 7) triangulate + gates (K=256)
p_prev = jnp.stack([f_prev.keypoints.x, f_prev.keypoints.y], -1)


def s_tri(x):
    prev_cam = Camera(m0.rvecs[1], m0.tvecs[1])
    P_prev = prev_cam.matrix(K)
    P_cur = Camera(cam0.rvec + x * 1e-20, cam0.tvec).matrix(K)
    X = triangulate(P_prev, P_cur, p_prev, uv)
    z_prev = (X @ rodrigues(prev_cam.rvec).T + prev_cam.tvec)[:, 2]
    e_prev = reprojection_error(prev_cam, X, p_prev, K)
    return x + 1e-20 * (X.sum() + z_prev.sum() + e_prev.sum())


# 8) whole register_frame
def s_reg(x):
    m, u = register_frame(
        key, m0, f_cur, f_prev,
        jnp.asarray(2, jnp.int32), K,
        jnp.zeros(uv.shape[0], bool), B,
    )
    return x + 1e-20 * (m.tvecs.sum() + m.points.sum())


x0 = jnp.zeros((), jnp.float32)
chain_ms(s_reg, "register_frame total", x0)
chain_ms(s_match3, "match 2D-3D (256x768)", x0)
chain_ms(s_pnp, "ransac_pnp total", x0)
chain_ms(s_dlt, "  sample+DLT (128 hyp)", x0)
chain_ms(s_score, "  hypothesis scoring", x0)
chain_ms(s_refine, "  refine_pose (5 iters)", x0)
chain_ms(s_match2, "match 2D-2D (256x256)", x0)
chain_ms(s_tri, "triangulate+gates", x0)
