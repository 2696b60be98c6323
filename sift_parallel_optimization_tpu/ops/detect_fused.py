"""Pallas TPU kernel: fused DoG-score + per-span candidate tables.

MEASURED RESULT (v5e, 512^2, chained-slope, round 3): this kernel LOSES
to the jnp/XLA path — pyramid+score+tables 0.22 ms vs 0.17 ms (kernel
stage ~0.15 vs XLA's ~0.10) — and is therefore NOT the production path.
The hypothesis was that _dense_score's XLA lowering (a chain of
reduce_windows + stencil fusions, each re-reading the DoG volume from
HBM; measured ~5-6 volume passes, 20% of speed-of-light) would lose to
one VMEM-resident pass. In practice the stage is VPU-INSTRUCTION-bound,
not HBM-bound: the ~130-op/voxel stencil+adjugate math dominates either
way, and XLA's stencil codegen (hardware shifted loads) beats this
kernel's pltpu.roll-based neighborhood access — hoisting the 81 rolls
to 45 shared ones and pooling the extremum tree per-plane did not move
it (0.2225 vs 0.2199). Kept, tested (interpret-mode table parity + the
top-k overlap check run on hardware), as the third documented negative
kernel result (ops/scale_space_pallas.py, ops/descriptor_fused.py) —
the production detection win came from restructuring instead (the
fused block-reduce extraction in models/detect.py, 0.19 -> 0.02 ms).

Mechanics: each grid step DMAs a (S+2, bh+8, W) row slab of an octave's
zero-padded DoG stack into VMEM (double-buffered, the next block's copy
in flight behind the current block's compute), evaluates the
26-neighbor extremum test, the Brown & Lowe quadratic-fit ranking score
(same expressions, same f32 op order as models/detect.py — keep them in
lockstep), and reduces each row's 64-lane spans to (max, argmax)
candidate-table entries; only the tables (~V/64 entries) reach HBM.

Mosaic lessons encoded here (they cost a day of SIGABRTs):
* HBM DMA row slices must be 8-aligned in offset AND size — hence the
  8-row zero pad and the 64-aligned block starts.
* Never SLICE a broadcasted iota: its replicated layout fails
  vector_extract_strided_slice bounds checks. Construct iotas at the
  exact shape used (ry1 (bh,1), li128 (bh,128)).
* Keep reductions 2-D (keepdims) — 1-D vectors trip the layout pass.

Reference analogue: the fused single-pass filter+DoG worker of
/root/reference/GaussDePyramid-pThread.h:211-254 — one sweep producing
every per-pixel product — extended through the detection math the
reference never had.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sift_parallel_optimization_tpu.models.detect import (
    EDGE_RATIO,
    MAX_REFINE_OFFSET,
)

# Candidate-table granularity (voxels per table entry). Matches the jnp
# block-reduce's blk=64 collision/recall profile.
SPAN = 64
# Row-block height per grid step: 64 keeps the double-buffered slabs +
# the ~19 live stencil temporaries comfortably inside VMEM at W=512.
BLOCK_ROWS = 64


def _shift(plane: jax.Array, dx: int) -> jax.Array:
    """out[.., rx] = plane[.., rx + dx] (circular; wrapped lanes are
    masked out by the interior-column mask downstream)."""
    if dx == 0:
        return plane
    return pltpu.roll(plane, plane.shape[-1] - dx, 1)


def _kernel(
    dog_ref, tv_ref, ti_ref, slab, sems,
    *, S: int, H: int, W: int, bh: int, thr: float, edge_ratio: float,
):
    """``dog_ref`` is the (S+2, H+8, W) zero-row-padded stack: HBM DMA
    row slices must be 8-aligned in offset and size, so each block reads
    a (bh+8)-row slab from its 64-aligned start and the pad guarantees
    the last block's slab is in bounds."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    hs, ws = H - 2, W - 2      # TRUE interior dims (pre-padding)
    hs_p = H + 8 - 2           # score-volume row stride of the padded stack
    nspan = W // SPAN

    def dma(j, slot):
        return pltpu.make_async_copy(
            dog_ref.at[:, pl.ds(j * bh, bh + 8), :],
            slab.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma(i + 1, (i + 1) % 2).start()

    dma(i, i % 2).wait()
    slot = i % 2

    # Iotas are constructed AT the shape they are used — slicing a
    # broadcasted iota trips Mosaic's layout pass (the replicated dims
    # fail vector_extract_strided_slice's bounds check).
    row_l = lax.broadcasted_iota(jnp.int32, (bh, W), 0)
    lane = lax.broadcasted_iota(jnp.int32, (bh, W), 1)
    ry = row_l + i * bh                        # global score row per cell
    # Rows beyond the true interior read zero padding — masked out.
    owned = (ry < hs) & (lane < ws)
    ry1 = lax.broadcasted_iota(jnp.int32, (bh, 1), 0) + i * bh
    li128 = lax.broadcasted_iota(jnp.int32, (bh, 128), 1)
    tvs, tis = [], []                          # (bh, 1) table columns

    # Shifted neighborhoods + per-plane 3x3 max/min pools, hoisted across
    # the S score planes (adjacent planes share them): 45 lane-rolls
    # instead of 81, and the 26-neighbor extremum tree becomes 3 pooled
    # maxima per scale. sh[p][dy][dx][.., rx] = dog[p, ry+dy, rx+dx].
    sh, pm, pn = [], [], []
    for p in range(S + 2):
        rows = [slab[slot, p, dy : dy + bh, :] for dy in range(3)]
        shp = [[_shift(rows[dy], dx) for dx in range(3)] for dy in range(3)]
        sh.append(shp)
        m9, n9 = shp[0][0], shp[0][0]
        for dy in range(3):
            for dx in range(3):
                if dy == 0 and dx == 0:
                    continue
                m9 = jnp.maximum(m9, shp[dy][dx])
                n9 = jnp.minimum(n9, shp[dy][dx])
        pm.append(m9)
        pn.append(n9)

    for scp in range(S):                       # score plane = dog plane-1
        # v[ds][dy][dx] = dog[scp+ds, ry+dy, rx+dx]. Same field
        # expressions and f32 op order as models/detect._grad_hess /
        # _solve3 / _edge_test. The pooled max/min INCLUDE the center
        # (like the jnp reduce_window), so c >= mx tests strict
        # 26-neighbor maximality exactly as _window_extrema does.
        v = [sh[scp], sh[scp + 1], sh[scp + 2]]
        c = v[1][1][1]
        mx = jnp.maximum(jnp.maximum(pm[scp], pm[scp + 1]), pm[scp + 2])
        mn = jnp.minimum(jnp.minimum(pn[scp], pn[scp + 1]), pn[scp + 2])
        is_ext = (c >= mx) | (c <= mn)

        gs = (v[2][1][1] - v[0][1][1]) / 2
        gy = (v[1][2][1] - v[1][0][1]) / 2
        gx = (v[1][1][2] - v[1][1][0]) / 2
        hss = v[2][1][1] + v[0][1][1] - 2 * c
        hyy = v[1][2][1] + v[1][0][1] - 2 * c
        hxx = v[1][1][2] + v[1][1][0] - 2 * c
        hsy = (v[2][2][1] - v[2][0][1] - v[0][2][1] + v[0][0][1]) / 4
        hsx = (v[2][1][2] - v[2][1][0] - v[0][1][2] + v[0][1][0]) / 4
        hyx = (v[1][2][2] - v[1][2][0] - v[1][0][2] + v[1][0][0]) / 4

        a, d, f, b_, c_, e = hss, hyy, hxx, hsy, hsx, hyx
        A = d * f - e * e
        B = c_ * e - b_ * f
        C = b_ * e - c_ * d
        D = a * f - c_ * c_
        E = b_ * c_ - a * e
        det = a * A + b_ * B + c_ * C
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        off_s = -(A * gs + B * gy + C * gx) * inv_det
        off_y = -(B * gs + D * gy + E * gx) * inv_det
        off_x = -(C * gs + E * gy + gx * (a * d - b_ * b_)) * inv_det

        tr = hxx + hyy
        det2 = hxx * hyy - hyx * hyx
        edge_ok = (det2 > 0) & (
            tr * tr * edge_ratio < (edge_ratio + 1) ** 2 * det2
        )

        lim = MAX_REFINE_OFFSET
        d_rank = c + 0.5 * (
            gs * jnp.clip(off_s, -lim, lim)
            + gy * jnp.clip(off_y, -lim, lim)
            + gx * jnp.clip(off_x, -lim, lim)
        )
        good = is_ext & (jnp.abs(d_rank) > thr) & edge_ok & owned
        score = jnp.where(good, jnp.abs(d_rank), 0.0)

        # Per-row SPAN-lane (max, argmax) table entries. argmax ties
        # resolve to the lowest lane, like jnp argmax. Everything stays
        # 2-D (keepdims) — 1-D vectors trip Mosaic's layout pass.
        # Indices address the PADDED score volume (row stride hs_p) so
        # callers holding the padded stack can gather directly.
        base = scp * hs_p * ws + ry1 * ws        # (bh, 1) i32 row bases
        for k in range(W // 128):
            sl = score[:, k * 128 : (k + 1) * 128]
            for half in range(128 // SPAN):
                hm = (li128 // SPAN) == half
                m = jnp.max(jnp.where(hm, sl, 0.0), axis=1, keepdims=True)
                am = jnp.min(
                    jnp.where(hm & (sl == m), li128 + k * 128, W),
                    axis=1, keepdims=True,
                )
                tvs.append(m)
                tis.append(jnp.clip(base + am, 0, S * hs_p * ws - 1))
    tv_ref[0] = jnp.concatenate(tvs, axis=1)
    ti_ref[0] = jnp.concatenate(tis, axis=1)


@functools.partial(
    jax.jit, static_argnames=("S", "thr", "edge_ratio", "interpret")
)
def fused_score_tables(
    dog_padded: jax.Array,
    S: int,
    thr: float,
    edge_ratio: float = EDGE_RATIO,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(S+2, H+8, W) zero-row-padded DoG stack -> candidate tables.

    The caller pads the true (S+2, H, W) stack with 8 zero rows at the
    bottom (``pad_dog``) — HBM DMA row slices must be 8-aligned, and the
    pad keeps the last row block's slab in bounds. tv: (T,) f32 span
    maxima of the ranking score (0 where no candidate); ti: (T,) i32
    flat indices into the PADDED (S, H+6, W-2) score volume (so gathers
    against the padded stack line up). T covers every true interior
    voxel exactly once. Requires H % BLOCK_ROWS == 0 and W % 128 == 0.
    """
    s2, Hp, W = dog_padded.shape
    assert s2 == S + 2
    H = Hp - 8
    if W % 128 or H % BLOCK_ROWS:
        raise ValueError(f"unsupported octave shape {dog_padded.shape}")
    bh = BLOCK_ROWS
    hs = H - 2
    nb = H // bh
    nspan = W // SPAN
    kern = functools.partial(
        _kernel, S=S, H=H, W=W, bh=bh, thr=float(thr),
        edge_ratio=float(edge_ratio),
    )
    tv, ti = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(
                (1, bh, S * nspan), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bh, S * nspan), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, bh, S * nspan), jnp.float32),
            jax.ShapeDtypeStruct((nb, bh, S * nspan), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, S + 2, bh + 8, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(dog_padded.astype(jnp.float32))
    return tv.reshape(-1), ti.reshape(-1)


def pad_dog(dog: jax.Array) -> jax.Array:
    """(S+2, H, W) -> the (S+2, H+8, W) zero-row-padded form the kernel
    (and its flat-gather consumers) index against."""
    return jnp.pad(dog, ((0, 0), (0, 8), (0, 0)))


def supports(shape: tuple[int, ...]) -> bool:
    """Whether the kernel handles a (S+2, H, W) TRUE octave shape."""
    _, h, w = shape
    return w % 128 == 0 and h % BLOCK_ROWS == 0 and h >= BLOCK_ROWS
