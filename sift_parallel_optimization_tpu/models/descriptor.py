"""Orientation assignment + 128-d SIFT descriptors, fully on device.

North-star extension (BASELINE.json config 2); the reference has no
descriptor stage. TPU-first design — NO scattered gathers on the hot path:

* Per keypoint, a fixed-size axis-aligned patch is cut from the (zero-
  padded) Gaussian plane with a vmapped `dynamic_slice` — the only gather
  in the pipeline, and a contiguous-block one.
* The sigma-proportional sample grid is AXIS-ALIGNED (rotation is applied
  to the bin coordinates and gradient angles, not the sampling lattice — the
  classic trick that makes resampling separable), so resampling is two small
  batched matmuls against bilinear hat-weight matrices: MXU work, not
  gather work.
* Gradients are central differences ON the resampled grid (uniform sigma-
  proportional spacing — scale-normalized by construction; the magnitude
  scale factor cancels in histogram normalization).
* Histogram votes use one-hot einsums (batched matmuls) with the trilinear
  corner loop unrolled statically.
* Keypoints of all octaves share one fixed-capacity array; each octave is a
  masked pass (octave count is static), keeping the frontend a single jit
  program with static shapes throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from sift_parallel_optimization_tpu.models.keypoints import Keypoints

N_ORI_BINS = 36
ORI_SIGMA_FACTOR = 1.5     # orientation window sigma = 1.5 * keypoint sigma
ORI_RADIUS_FACTOR = 3.0    # window radius = 3 * window sigma
ORI_GRID = 18              # samples per axis (16x16 usable gradients)
ORI_PATCH = 48             # patch side, covers radius 4.5*sigma_o <= ~17 px

DESC_WIDTH = 4             # 4x4 spatial bins
DESC_ORI_BINS = 8
DESC_GRID = 26             # samples per axis (24x24 usable gradients)
DESC_PATCH = 96            # covers radius sqrt(2)*1.5*sigma*(d+1) <= ~40 px
DESC_BIN_SIGMA = 3.0       # spatial bin width = 3 * sigma_o (Lowe 2004)
DESC_CLIP = 0.2


def _pad_octave(gauss: jax.Array, pad: int) -> jax.Array:
    """Zero-pad (S+3, H, W) spatially so every patch slice is in bounds.

    Zero padding (not edge) so out-of-image samples have zero gradient
    magnitude and silently drop out of the histograms.
    """
    return jnp.pad(gauss, ((0, 0), (pad, pad), (pad, pad)))


def _extract_patches(
    padded: jax.Array, kp: Keypoints, octave: int, patch: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(K, patch, patch) axis-aligned patches around each keypoint.

    Returns (patches, fy, fx): fractional keypoint position relative to the
    patch center (sample coordinates are patch_center + offset + f).
    """
    pad = patch // 2 + 1
    inv = 1.0 / float(2**octave)
    y_o, x_o = kp.y * inv, kp.x * inv
    yi = jnp.floor(y_o)
    xi = jnp.floor(x_o)
    fy, fx = y_o - yi, x_o - xi
    h, w = padded.shape[-2] - 2 * pad, padded.shape[-1] - 2 * pad
    ys = jnp.clip(yi.astype(jnp.int32), 0, max(h - 1, 0)) - patch // 2 + pad
    xs = jnp.clip(xi.astype(jnp.int32), 0, max(w - 1, 0)) - patch // 2 + pad

    def one(s, y0, x0):
        return lax.dynamic_slice(
            padded, (s, y0, x0), (1, patch, patch)
        )[0]

    patches = jax.vmap(one)(kp.scale, ys, xs)
    return patches, fy, fx


def _hat_weights(coords: jax.Array, patch: int) -> jax.Array:
    """(K, G) absolute patch coords -> (K, G, patch) bilinear hat weights."""
    p = jnp.arange(patch, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - p))


def _resample(patches, fy, fx, offsets, patch: int) -> jax.Array:
    """Separable bilinear resample at axis-aligned sigma-scaled offsets.

    patches: (K, P, P); offsets: (K, G) pixel offsets from the keypoint.
    Returns (K, G, G) samples at (kp + offset_row, kp + offset_col).
    """
    cy = fy[:, None] + patch // 2 + offsets          # (K, G) rows
    cx = fx[:, None] + patch // 2 + offsets          # (K, G) cols
    ay = _hat_weights(cy, patch)                     # (K, G, P)
    ax = _hat_weights(cx, patch)                     # (K, G, P)
    t = jnp.einsum("kgp,kpq->kgq", ay, patches,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("kgq,khq->kgh", t, ax,
                      preferred_element_type=jnp.float32)


def _grid_gradients(samples: jax.Array):
    """(K, G, G) -> (gy, gx) central differences, (K, G-2, G-2)."""
    gy = (samples[:, 2:, 1:-1] - samples[:, :-2, 1:-1]) / 2
    gx = (samples[:, 1:-1, 2:] - samples[:, 1:-1, :-2]) / 2
    return gy, gx


def _smooth_hist_circular(hist: jax.Array, iters: int = 2) -> jax.Array:
    """[1,4,6,4,1]/16 circular smoothing along the last axis."""
    for _ in range(iters):
        hist = (
            6 * hist
            + 4 * (jnp.roll(hist, 1, -1) + jnp.roll(hist, -1, -1))
            + (jnp.roll(hist, 2, -1) + jnp.roll(hist, -2, -1))
        ) / 16.0
    return hist


def _orientation_hist_octave(
    gauss: jax.Array, kp: Keypoints, octave: int
) -> jax.Array:
    """(K, 36) gradient-orientation histogram for one octave's keypoints."""
    g = ORI_GRID
    padded = _pad_octave(gauss, ORI_PATCH // 2 + 1)
    patches, fy, fx = _extract_patches(padded, kp, octave, ORI_PATCH)

    sig_o = kp.sigma / float(2**octave)
    win_sigma = ORI_SIGMA_FACTOR * sig_o
    radius = ORI_RADIUS_FACTOR * win_sigma            # (K,)
    lin = jnp.linspace(-1.0, 1.0, g)
    offsets = lin[None, :] * radius[:, None]          # (K, G)
    step = offsets[:, 1] - offsets[:, 0]              # (K,) grid spacing

    samples = _resample(patches, fy, fx, offsets, ORI_PATCH)
    gy, gx = _grid_gradients(samples)                 # (K, g-2, g-2)
    k = kp.capacity
    mag = jnp.sqrt(gx * gx + gy * gy).reshape(k, -1)
    ang = jnp.arctan2(gy, gx).reshape(k, -1)

    du = offsets[:, 1:-1]                             # interior offsets
    d2 = du[:, :, None] ** 2 + du[:, None, :] ** 2    # (K, g-2, g-2)
    w = mag * jnp.exp(
        -d2.reshape(k, -1) / (2.0 * win_sigma[:, None] ** 2 + 1e-12)
    )

    binf = (ang + jnp.pi) / (2 * jnp.pi) * N_ORI_BINS
    bin_i = jnp.clip(binf.astype(jnp.int32), 0, N_ORI_BINS - 1)
    onehot = jax.nn.one_hot(bin_i, N_ORI_BINS, dtype=w.dtype)
    return jnp.einsum("kp,kpb->kb", w, onehot,
                      preferred_element_type=jnp.float32)


def assign_orientations(
    gauss_octaves: list[jax.Array], kp: Keypoints
) -> Keypoints:
    """Fill ``kp.orientation`` with the dominant gradient direction.

    One orientation per keypoint (the dominant histogram peak with parabolic
    interpolation). Secondary peaks (Lowe's 80% rule) are intentionally not
    duplicated — capacity-stable shapes beat a ~15% keypoint count increase
    on TPU; the slot budget is better spent on fresh detections.
    """
    hist = jnp.zeros((kp.capacity, N_ORI_BINS), jnp.float32)
    for o, gauss in enumerate(gauss_octaves):
        h = _orientation_hist_octave(gauss, kp, o)
        hist = jnp.where((kp.octave == o)[:, None], h, hist)

    hist = _smooth_hist_circular(hist)
    peak = jnp.argmax(hist, axis=-1)                  # (K,)
    hp = jnp.take_along_axis(hist, peak[:, None], -1)[:, 0]
    hl = jnp.take_along_axis(hist, ((peak - 1) % N_ORI_BINS)[:, None], -1)[:, 0]
    hr = jnp.take_along_axis(hist, ((peak + 1) % N_ORI_BINS)[:, None], -1)[:, 0]
    denom = hl - 2 * hp + hr
    frac = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (hl - hr) / denom, 0.0)
    binf = peak.astype(jnp.float32) + frac
    theta = binf / N_ORI_BINS * 2 * jnp.pi - jnp.pi
    theta = jnp.mod(theta + jnp.pi, 2 * jnp.pi) - jnp.pi
    return kp._replace(orientation=jnp.where(kp.valid, theta, 0.0))


def _descriptor_octave(
    gauss: jax.Array, kp: Keypoints, octave: int
) -> jax.Array:
    """(K, d*d*8) raw descriptor histograms for one octave's keypoints."""
    d = DESC_WIDTH
    g = DESC_GRID
    padded = _pad_octave(gauss, DESC_PATCH // 2 + 1)
    patches, fy, fx = _extract_patches(padded, kp, octave, DESC_PATCH)

    sig_o = kp.sigma / float(2**octave)
    bin_w = DESC_BIN_SIGMA * sig_o                    # (K,) pixels per bin
    # Axis-aligned window must cover the rotated d x d bin square.
    radius = bin_w * (2**0.5) * (d + 1) * 0.5
    lin = jnp.linspace(-1.0, 1.0, g)
    offsets = lin[None, :] * radius[:, None]          # (K, G)

    samples = _resample(patches, fy, fx, offsets, DESC_PATCH)
    gy, gx = _grid_gradients(samples)
    k = kp.capacity
    p = (g - 2) * (g - 2)
    mag = jnp.sqrt(gx * gx + gy * gy).reshape(k, p)
    theta = kp.orientation
    ang = jnp.arctan2(gy, gx).reshape(k, p) - theta[:, None]

    # Rotate sample offsets into the descriptor frame, in bin units.
    du = offsets[:, 1:-1]                             # (K, g-2) rows (y)
    dy = jnp.broadcast_to(du[:, :, None], (k, g - 2, g - 2)).reshape(k, p)
    dx = jnp.broadcast_to(du[:, None, :], (k, g - 2, g - 2)).reshape(k, p)
    cos_t, sin_t = jnp.cos(theta)[:, None], jnp.sin(theta)[:, None]
    inv_bw = 1.0 / jnp.maximum(bin_w, 1e-6)[:, None]
    u = (cos_t * dy - sin_t * dx) * inv_bw            # rotated row, bin units
    v = (sin_t * dy + cos_t * dx) * inv_bw            # rotated col, bin units

    w = mag * jnp.exp(-(u * u + v * v) / (0.5 * d * d))

    rbin = u + d / 2.0 - 0.5
    cbin = v + d / 2.0 - 0.5
    obin = jnp.mod(ang, 2 * jnp.pi) / (2 * jnp.pi) * DESC_ORI_BINS
    r0, c0, o0 = jnp.floor(rbin), jnp.floor(cbin), jnp.floor(obin)
    fr, fc, fo = rbin - r0, cbin - c0, obin - o0

    hist = jnp.zeros((k, d * d * DESC_ORI_BINS), jnp.float32)
    for dr in (0, 1):
        for dc in (0, 1):
            for do in (0, 1):
                rr, cc = r0 + dr, c0 + dc
                oo = jnp.mod(o0 + do, DESC_ORI_BINS).astype(jnp.int32)
                wv = (
                    w
                    * jnp.where(dr, fr, 1 - fr)
                    * jnp.where(dc, fc, 1 - fc)
                    * jnp.where(do, fo, 1 - fo)
                )
                inb = (rr >= 0) & (rr < d) & (cc >= 0) & (cc < d)
                wv = jnp.where(inb, wv, 0.0)
                ri = jnp.clip(rr.astype(jnp.int32), 0, d - 1)
                ci = jnp.clip(cc.astype(jnp.int32), 0, d - 1)
                flat = (ri * d + ci) * DESC_ORI_BINS + oo
                onehot = jax.nn.one_hot(
                    flat, d * d * DESC_ORI_BINS, dtype=wv.dtype
                )
                hist = hist + jnp.einsum(
                    "kp,kpb->kb", wv, onehot,
                    preferred_element_type=jnp.float32,
                )
    return hist


def compute_descriptors(
    gauss_octaves: list[jax.Array], kp: Keypoints
) -> jax.Array:
    """(K, 128) L2-normalized, 0.2-clipped SIFT descriptors (Lowe 2004)."""
    d = DESC_WIDTH
    hist = jnp.zeros((kp.capacity, d * d * DESC_ORI_BINS), jnp.float32)
    for o, gauss in enumerate(gauss_octaves):
        h = _descriptor_octave(gauss, kp, o)
        hist = jnp.where((kp.octave == o)[:, None], h, hist)

    desc = hist
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-7)
    desc = jnp.minimum(desc, DESC_CLIP)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-7)
    return jnp.where(kp.valid[:, None], desc, 0.0)
