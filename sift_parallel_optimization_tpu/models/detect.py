"""On-device DoG extrema detection (SIFT keypoint localization).

North-star extension (BASELINE.json config 2): the reference computes the
DoG pyramid and stops (SURVEY.md — no detection exists in
ZhangShuui/SIFT-parallel-optimization); this module consumes the SIFT-mode
pyramid of core/pyramid_ref.py and finds scale-space extrema the TPU way:

* 3x3x3 extremum test as dense `lax.reduce_window` max/min pools + compare —
  no per-pixel branching, everything stays on the VPU;
* subpixel refinement (Brown & Lowe quadratic fit) computed DENSELY: the 3D
  gradient/Hessian are finite-difference stencils and the 3x3 solve is a
  closed-form adjugate — cheaper to do everywhere than to gather candidates;
* fixed-capacity extraction: score-masked `lax.top_k` over the flattened
  octave, unraveled back to (scale, y, x) — the static-shape substitute for
  dynamic compaction (SURVEY.md section 7 hard part (b)).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax

from sift_parallel_optimization_tpu.config import PyramidConfig
from sift_parallel_optimization_tpu.models.keypoints import (
    Keypoints,
    concat_keypoints,
    top_k_keypoints,
)

# Detection thresholds (standard SIFT values for images scaled to [0, 1]).
CONTRAST_THRESHOLD = 0.04
EDGE_RATIO = 10.0
MAX_REFINE_OFFSET = 0.6  # reject candidates whose quadratic fit moves further


def _window_extrema(dog: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(D, H, W) -> bool (D-2, H-2, W-2): strict 26-neighbor max / min."""
    mx = lax.reduce_window(
        dog, -jnp.inf, lax.max, (3, 3, 3), (1, 1, 1), "VALID"
    )
    mn = lax.reduce_window(
        dog, jnp.inf, lax.min, (3, 3, 3), (1, 1, 1), "VALID"
    )
    c = dog[1:-1, 1:-1, 1:-1]
    return c >= mx, c <= mn


def _grad_hess(dog: jax.Array):
    """Dense central differences at interior voxels of (D, H, W).

    Returns g = (gs, gy, gx) and Hessian entries, each (D-2, H-2, W-2).
    """
    c = dog[1:-1, 1:-1, 1:-1]
    ds_p, ds_m = dog[2:, 1:-1, 1:-1], dog[:-2, 1:-1, 1:-1]
    dy_p, dy_m = dog[1:-1, 2:, 1:-1], dog[1:-1, :-2, 1:-1]
    dx_p, dx_m = dog[1:-1, 1:-1, 2:], dog[1:-1, 1:-1, :-2]
    gs, gy, gx = (ds_p - ds_m) / 2, (dy_p - dy_m) / 2, (dx_p - dx_m) / 2
    hss = ds_p + ds_m - 2 * c
    hyy = dy_p + dy_m - 2 * c
    hxx = dx_p + dx_m - 2 * c
    hsy = (dog[2:, 2:, 1:-1] - dog[2:, :-2, 1:-1]
           - dog[:-2, 2:, 1:-1] + dog[:-2, :-2, 1:-1]) / 4
    hsx = (dog[2:, 1:-1, 2:] - dog[2:, 1:-1, :-2]
           - dog[:-2, 1:-1, 2:] + dog[:-2, 1:-1, :-2]) / 4
    hyx = (dog[1:-1, 2:, 2:] - dog[1:-1, 2:, :-2]
           - dog[1:-1, :-2, 2:] + dog[1:-1, :-2, :-2]) / 4
    return (gs, gy, gx), (hss, hyy, hxx, hsy, hsx, hyx)


def _solve3(h, g):
    """Solve H @ off = -g for symmetric 3x3 H, densely, via adjugate.

    h = (hss, hyy, hxx, hsy, hsx, hyx); g = (gs, gy, gx). Returns
    (off_s, off_y, off_x, det).
    """
    a, d, f, b, c, e = h  # H = [[a,b,c],[b,d,e],[c,e,f]]
    gs, gy, gx = g
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    det = a * A + b * B + c * C
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    off_s = -(A * gs + B * gy + C * gx) * inv_det
    off_y = -(B * gs + D * gy + E * gx) * inv_det
    off_x = -(C * gs + E * gy + F * gx) * inv_det
    return off_s, off_y, off_x, det


def detect_octave(
    dog: jax.Array,
    octave: int,
    cfg: PyramidConfig,
    capacity: int,
    contrast_threshold: float = CONTRAST_THRESHOLD,
    edge_ratio: float = EDGE_RATIO,
    refine_iters: int = 2,
) -> Keypoints:
    """(S+2, H, W) DoG stack of one octave -> Keypoints with ``capacity`` slots.

    Coordinates/sigma are returned in ORIGINAL image units (scaled by 2^octave).

    ``refine_iters`` > 0 enables iterative subpixel refinement (Brown &
    Lowe / OpenCV): a candidate whose quadratic fit lands further than
    MAX_REFINE_OFFSET from its voxel is re-fit at the neighbor voxel the
    fit points to, up to ``refine_iters`` hops — recovering the ~7% of
    true keypoints the single-shot offset gate rejects. The hops are
    SPARSE (flat gathers on the already-dense offset fields for just the
    top-k candidates), so the dense stencil work is unchanged.
    """
    dog = dog.astype(jnp.float32)
    is_max, is_min = _window_extrema(dog)
    g, h = _grad_hess(dog)
    off_s, off_y, off_x, _det3 = _solve3(h, g)
    c = dog[1:-1, 1:-1, 1:-1]
    gs, gy, gx = g
    hss, hyy, hxx, hsy, hsx, hyx = h

    # Refined contrast |D_hat| = |D + 1/2 g . offset|.
    d_hat = c + 0.5 * (gs * off_s + gy * off_y + gx * off_x)

    # 2D edge test on the spatial Hessian.
    tr = hxx + hyy
    det2 = hxx * hyy - hyx * hyx
    edge_ok = (det2 > 0) & (
        tr * tr * edge_ratio < (edge_ratio + 1) ** 2 * det2
    )

    off_ok = (
        (jnp.abs(off_s) < MAX_REFINE_OFFSET)
        & (jnp.abs(off_y) < MAX_REFINE_OFFSET)
        & (jnp.abs(off_x) < MAX_REFINE_OFFSET)
    )
    # Lowe/OpenCV convention: the usable threshold scales with the number
    # of intervals (DoG plane spacing shrinks as S grows).
    thr = contrast_threshold / cfg.S
    if refine_iters:
        # Rank WITHOUT the offset gate (failed fits get a chance to hop to
        # the right voxel); contrast for ranking uses offsets clamped to
        # the trust region so a near-singular Hessian cannot inflate it.
        d_rank = c + 0.5 * (
            gs * jnp.clip(off_s, -MAX_REFINE_OFFSET, MAX_REFINE_OFFSET)
            + gy * jnp.clip(off_y, -MAX_REFINE_OFFSET, MAX_REFINE_OFFSET)
            + gx * jnp.clip(off_x, -MAX_REFINE_OFFSET, MAX_REFINE_OFFSET)
        )
        good = (is_max | is_min) & (jnp.abs(d_rank) > thr) & edge_ok
        score = jnp.where(good, jnp.abs(d_rank), 0.0)
    else:
        good = (
            (is_max | is_min)
            & (jnp.abs(d_hat) > thr)
            & edge_ok
            & off_ok
        )
        score = jnp.where(good, jnp.abs(d_hat), 0.0)

    # Static-shape extraction: top-k over the flattened interior. On TPU,
    # approx_max_k (tiled two-stage reduction) is ~200x faster than the
    # exact sort-based top_k at these sizes; exact top_k elsewhere keeps
    # CPU tests deterministic. recall_target=0.99 bounds the TPU-vs-CPU
    # top-k divergence to ~1% of true candidates (a backend-divergence
    # class guarded on hardware by tools/tpu_sanity.py).
    ds, hs, ws = score.shape
    flat = score.reshape(-1)
    k = min(capacity, flat.shape[0])
    if jax.default_backend() in ("tpu", "axon") and flat.shape[0] >= 4096:
        vals, idx = lax.approx_max_k(flat, k, recall_target=0.99)
    else:
        vals, idx = lax.top_k(flat, k)
    if vals.shape[0] < capacity:  # tiny octave: pad up to capacity
        pad = capacity - vals.shape[0]
        vals = jnp.pad(vals, (0, pad))
        idx = jnp.pad(idx, (0, pad))
    s_i = idx // (hs * ws)
    y_i = (idx // ws) % hs
    x_i = idx % ws
    if refine_iters:
        # Sparse neighbor-hop refinement on the K candidates: gather the
        # (already computed) dense quadratic fit at each candidate's voxel,
        # hop one voxel toward the fit when it escapes the trust region,
        # re-gather, repeat. Pure flat takes — K is tiny.
        offs = jnp.stack(
            [off_s.reshape(-1), off_y.reshape(-1), off_x.reshape(-1)]
        )                                             # (3, V)
        pos = jnp.stack([s_i, y_i, x_i])              # (3, K)
        lims = jnp.array([ds - 1, hs - 1, ws - 1], jnp.int32)[:, None]
        for _ in range(refine_iters):
            flat = (pos[0] * hs + pos[1]) * ws + pos[2]
            o = offs[:, flat]                         # (3, K)
            conv = jnp.all(jnp.abs(o) <= MAX_REFINE_OFFSET, axis=0)
            shift = jnp.clip(jnp.round(o), -1, 1).astype(jnp.int32)
            pos = jnp.where(
                conv[None, :], pos, jnp.clip(pos + shift, 0, lims)
            )
        flat = (pos[0] * hs + pos[1]) * ws + pos[2]
        fs, fy, fx = offs[0, flat], offs[1, flat], offs[2, flat]
        s_i, y_i, x_i = pos[0], pos[1], pos[2]
        d_f = jnp.abs(d_hat.reshape(-1)[flat])
        edge_f = edge_ok.reshape(-1)[flat]
        off_ok_f = (
            (jnp.abs(fs) < MAX_REFINE_OFFSET)
            & (jnp.abs(fy) < MAX_REFINE_OFFSET)
            & (jnp.abs(fx) < MAX_REFINE_OFFSET)
        )
        valid = (vals > 0) & off_ok_f & (d_f > thr) & edge_f
        vals = jnp.where(valid, d_f, 0.0)
    else:
        take = lambda a: a.reshape(-1)[idx]
        fs, fy, fx = take(off_s), take(off_y), take(off_x)
        valid = vals > 0

    # +1: interior offset from the VALID window; coords in octave pixels.
    x_o = x_i.astype(jnp.float32) + 1.0 + fx
    y_o = y_i.astype(jnp.float32) + 1.0 + fy
    s_o = s_i.astype(jnp.float32) + 1.0 + fs  # DoG plane index (1..S)

    scale_mult = float(2**octave)
    sigma = cfg.sigma0 * jnp.exp2(s_o / cfg.S) * scale_mult
    return Keypoints(
        x=jnp.where(valid, x_o * scale_mult, 0.0),
        y=jnp.where(valid, y_o * scale_mult, 0.0),
        sigma=jnp.where(valid, sigma, 0.0),
        score=vals,
        orientation=jnp.zeros_like(vals),
        octave=jnp.full_like(s_i, octave, dtype=jnp.int32),
        scale=(s_i + 1).astype(jnp.int32),
        valid=valid,
    )


def detect_pyramid(
    dogs: list[jax.Array],
    cfg: PyramidConfig,
    max_keypoints: int = 512,
    per_octave_capacity: int | None = None,
    **thresholds,
) -> Keypoints:
    """Full-pyramid detection -> top ``max_keypoints`` across all octaves."""
    if per_octave_capacity is None:
        per_octave_capacity = max_keypoints
    kps = [
        detect_octave(d, o, cfg, per_octave_capacity, **thresholds)
        for o, d in enumerate(dogs)
    ]
    return top_k_keypoints(concat_keypoints(kps), max_keypoints)
