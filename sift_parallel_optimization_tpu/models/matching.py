"""Descriptor matching + robust model fitting (RANSAC), fully on device.

North-star extension (BASELINE.json config 3); the reference has no matching
stage. TPU-first design:

* Brute-force matching IS a matmul: descriptors are L2-normalized so
  dist^2 = 2 - 2 * sim with sim = D1 @ D2^T — one (K, 128) x (128, K) MXU
  contraction, then top-2 per row for Lowe's ratio test and an argmax per
  column for the mutual-nearest check. No KD-trees — at K <= a few thousand
  the systolic array beats any tree walk by orders of magnitude.
* RANSAC is BATCHED, not iterative: all N hypotheses are sampled, solved
  (batched 8x8 linear solves / small SVDs) and scored (an (N, K) distance
  matrix — again matmul-shaped) in one shot; `argmax` picks the winner.
  Degenerate samples score -inf instead of being resampled — static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sift_parallel_optimization_tpu.models.keypoints import Keypoints


def _f32_precision(fn):
    """HIGHEST matmul precision wrapper (see models/geometry.py)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


class Matches(NamedTuple):
    """Row i: keypoint i of image 1 matched to ``idx2[i]`` of image 2."""

    idx2: jax.Array       # (K,) i32 index into image-2 keypoints
    similarity: jax.Array  # (K,) f32 cosine similarity of best match
    valid: jax.Array      # (K,) bool — passed ratio + mutual-NN + validity

    def count(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


def match_descriptors(
    desc1: jax.Array,
    desc2: jax.Array,
    valid1: jax.Array,
    valid2: jax.Array,
    ratio: float = 0.8,
    mutual: bool = True,
) -> Matches:
    """Ratio-test + mutual-NN matching of (K1, 128) x (K2, 128) descriptors.

    Lowe's ratio test on L2 distances d = sqrt(2 - 2 sim):
    d1 < ratio * d2  <=>  (2 - 2 s1) < ratio^2 * (2 - 2 s2).
    """
    sim = jnp.einsum(
        "id,jd->ij", desc1, desc2, preferred_element_type=jnp.float32
    )
    sim = jnp.where(valid2[None, :], sim, -jnp.inf)
    # Exact top-2 WITHOUT lax.top_k: with BOTH values live, top_k(k=2)
    # takes TPU's general sort-based path — measured 1.8 ms on a
    # (256, 8192) archive-matching sim matrix (round 5,
    # tools/attrib_loop_scan2.py), 20x the rest of the matcher
    # combined; max/argmax + a best-column-masked second max are plain
    # lane reductions (~0.03 ms), and reproduce top_k's semantics
    # exactly (first index among ties; duplicate-max values yield the
    # same second value).
    s1 = jnp.max(sim, axis=1)
    best = jnp.argmax(sim, axis=1)
    cols = jnp.arange(desc2.shape[0], dtype=jnp.int32)
    s2 = jnp.max(
        jnp.where(cols[None, :] == best[:, None], -jnp.inf, sim), axis=1
    )

    d1_sq = 2.0 - 2.0 * s1
    d2_sq = 2.0 - 2.0 * s2
    ratio_ok = d1_sq < (ratio * ratio) * d2_sq

    ok = valid1 & ratio_ok & jnp.isfinite(s1)
    if mutual:
        back = jnp.argmax(
            jnp.where(valid1[:, None], sim, -jnp.inf), axis=0
        )                                              # (K2,) best row per col
        ok = ok & (back[best] == jnp.arange(desc1.shape[0]))
    return Matches(idx2=best, similarity=s1, valid=ok)


def matched_points(
    kp1: Keypoints, kp2: Keypoints, m: Matches
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(K, 2) xy points in image 1 / image 2 and the pair-valid mask."""
    p1 = jnp.stack([kp1.x, kp1.y], axis=-1)
    p2 = jnp.stack([kp2.x[m.idx2], kp2.y[m.idx2]], axis=-1)
    return p1, p2, m.valid & kp2.valid[m.idx2]


# ---------------------------------------------------------------------------
# Batched RANSAC
# ---------------------------------------------------------------------------


def _sample_indices(key, valid, n_hyp: int, n_pts: int) -> jax.Array:
    """(n_hyp, n_pts) indices drawn from valid slots (may repeat — repeats
    make the sample degenerate and it scores -inf, which is fine)."""
    logits = jnp.where(valid, 0.0, -jnp.inf)
    return jax.random.categorical(
        key, logits[None, :], shape=(n_hyp, n_pts)
    )


def _normalize_points(p: jax.Array, mask: jax.Array):
    """Hartley normalization: zero-mean, mean distance sqrt(2). Returns
    normalized points and the 3x3 transform T with p_n ~ T @ p_h."""
    wsum = jnp.maximum(mask.sum(), 1.0)
    mean = (p * mask[:, None]).sum(0) / wsum
    d = jnp.sqrt(((p - mean) ** 2).sum(-1))
    scale = jnp.sqrt(2.0) / jnp.maximum((d * mask).sum() / wsum, 1e-8)
    pn = (p - mean) * scale
    T = jnp.stack([
        jnp.stack([scale, 0.0 * scale, -scale * mean[0]]),
        jnp.stack([0.0 * scale, scale, -scale * mean[1]]),
        jnp.stack([0.0 * scale, 0.0 * scale, 1.0 + 0.0 * scale]),
    ])
    return pn, T


def _dlt_rows(p1: jax.Array, p2: jax.Array):
    """Homography DLT design (2N, 8) matrix and (2N,) rhs with h33 = 1.

    Shared by the minimal solver and the inlier refinement so both solve
    the SAME parameterization.
    """
    x, y = p1[:, 0], p1[:, 1]
    u, v = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    rows_u = jnp.stack([x, y, o, z, z, z, -u * x, -u * y], axis=-1)
    rows_v = jnp.stack([z, z, z, x, y, o, -v * x, -v * y], axis=-1)
    a = jnp.concatenate([rows_u, rows_v], axis=0)      # (2N, 8)
    b = jnp.concatenate([u, v], axis=0)                # (2N,)
    return a, b


def _homography_from_4(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """(4, 2) x (4, 2) -> (3, 3) homography via DLT with h33 = 1.

    8x8 linear solve; a singular system yields inf/nan entries which the
    scoring pass maps to -inf inliers — no branching needed.
    """
    a, b = _dlt_rows(p1, p2)
    h = jnp.linalg.solve(a, b)
    return jnp.concatenate([h, jnp.ones((1,))]).reshape(3, 3)


def _apply_h(h: jax.Array, p: jax.Array) -> jax.Array:
    """(3,3) x (K,2) -> (K,2) projective transform."""
    ph = jnp.concatenate([p, jnp.ones_like(p[:, :1])], axis=-1)
    q = ph @ h.T
    return q[:, :2] / jnp.where(jnp.abs(q[:, 2:]) > 1e-12, q[:, 2:], 1e-12)


class RansacResult(NamedTuple):
    model: jax.Array     # (3, 3) homography or fundamental matrix
    inliers: jax.Array   # (K,) bool
    n_inliers: jax.Array  # () i32


@_f32_precision
def ransac_homography(
    key,
    p1: jax.Array,
    p2: jax.Array,
    mask: jax.Array,
    n_hypotheses: int = 256,
    threshold: float = 3.0,
) -> RansacResult:
    """Batched-hypothesis RANSAC homography p1 -> p2.

    All hypotheses solved and scored concurrently; inliers by FORWARD
    transfer error |H p1 - p2| (one-way — cheap and sufficient for the
    verification/refinement loop; use a symmetric check downstream if the
    application needs it).
    """
    idx = _sample_indices(key, mask, n_hypotheses, 4)
    h = jax.vmap(lambda i: _homography_from_4(p1[i], p2[i]))(idx)  # (N,3,3)
    h_ok = jnp.all(jnp.isfinite(h.reshape(n_hypotheses, -1)), axis=-1)
    h = jnp.where(h_ok[:, None, None], h, jnp.eye(3))

    fwd = jax.vmap(lambda hh: _apply_h(hh, p1))(h)     # (N, K, 2)
    err = ((fwd - p2[None]) ** 2).sum(-1)              # (N, K)
    inl = (err < threshold * threshold) & mask[None, :]
    score = jnp.where(h_ok, inl.sum(-1), -1)
    best = jnp.argmax(score)
    h_best = _refine_homography(p1, p2, inl[best].astype(jnp.float32))
    # Re-score with the refined model (inlier set can only be cleaner).
    err_r = ((_apply_h(h_best, p1) - p2) ** 2).sum(-1)
    inl_r = (err_r < threshold * threshold) & mask
    return RansacResult(
        model=h_best, inliers=inl_r, n_inliers=inl_r.sum()
    )


def _refine_homography(p1, p2, w: jax.Array) -> jax.Array:
    """Weighted least-squares DLT (h33 = 1) over all points with weights w."""
    a, b = _dlt_rows(p1, p2)
    ww = jnp.concatenate([w, w], axis=0)
    ata = jnp.einsum("ki,k,kj->ij", a, ww, a) + 1e-6 * jnp.eye(8)
    atb = jnp.einsum("ki,k->i", a, ww * b)
    h = jnp.linalg.solve(ata, atb)
    return jnp.concatenate([h, jnp.ones((1,))]).reshape(3, 3)


def _fundamental_from_8(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """(8+, 2) correspondences -> (3, 3) rank-2 fundamental via 8-point."""
    x, y = p1[:, 0], p1[:, 1]
    u, v = p2[:, 0], p2[:, 1]
    o = jnp.ones_like(x)
    a = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, o], axis=-1)
    # Null vector of A: smallest right singular vector.
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    f = vt[-1].reshape(3, 3)
    # Enforce rank 2.
    uf, sf, vft = jnp.linalg.svd(f)
    sf = sf.at[2].set(0.0)
    return (uf * sf[None, :]) @ vft


def _epipolar_dist_sq(f: jax.Array, p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Sampson distance squared of correspondences under F."""
    ph1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], -1)  # (K,3)
    ph2 = jnp.concatenate([p2, jnp.ones_like(p2[:, :1])], -1)
    fx1 = ph1 @ f.T        # (K, 3) = F p1
    ftx2 = ph2 @ f         # (K, 3) = F^T p2
    num = jnp.sum(ph2 * fx1, axis=-1) ** 2
    den = fx1[:, 0] ** 2 + fx1[:, 1] ** 2 + ftx2[:, 0] ** 2 + ftx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@_f32_precision
def ransac_fundamental(
    key,
    p1: jax.Array,
    p2: jax.Array,
    mask: jax.Array,
    n_hypotheses: int = 256,
    threshold: float = 1.5,
) -> RansacResult:
    """Batched 8-point RANSAC fundamental matrix with Sampson scoring.

    Points are Hartley-normalized PER HYPOTHESIS SAMPLE (the textbook
    8-point protocol — each minimal sample's own mean/spread conditions
    its DLT system, so clustered degenerate samples stay well scaled);
    each hypothesis is de-normalized with its own transforms before
    pixel-space scoring.
    """
    idx = _sample_indices(key, mask, n_hypotheses, 8)

    def solve_one(i):
        q1, q2 = p1[i], p2[i]                          # (8, 2) raw pixels
        ones = jnp.ones(8)
        qn1, s_t1 = _normalize_points(q1, ones)
        qn2, s_t2 = _normalize_points(q2, ones)
        fn = _fundamental_from_8(qn1, qn2)
        # De-normalize: p2n^T F p1n = p2^T (T2^T F T1) p1.
        return s_t2.T @ fn @ s_t1

    f_px = jax.vmap(solve_one)(idx)                    # (N, 3, 3)
    f_ok = jnp.all(jnp.isfinite(f_px.reshape(n_hypotheses, -1)), axis=-1)
    f_px = jnp.where(f_ok[:, None, None], f_px, jnp.eye(3))

    # Score in PIXEL coordinates: Sampson distance mixes gradients from
    # both images, so a single normalized-frame threshold is wrong when
    # the two point sets have different spreads.
    err = jax.vmap(lambda ff: _epipolar_dist_sq(ff, p1, p2))(f_px)
    inl = (err < threshold * threshold) & mask[None, :]
    score = jnp.where(f_ok, inl.sum(-1), -1)
    best = jnp.argmax(score)
    f_best = f_px[best]
    nrm = jnp.linalg.norm(f_best)
    f_best = f_best / jnp.where(nrm > 1e-12, nrm, 1.0)
    # When every hypothesis was non-finite, score[best] is the -1 sentinel
    # and the "model" is a denormalized identity: clamp the count to 0 and
    # zero the inlier mask so downstream gating rejects everything.
    any_ok = score[best] >= 0
    return RansacResult(
        model=f_best,
        inliers=inl[best] & any_ok,
        n_inliers=jnp.maximum(score[best], 0),
    )
