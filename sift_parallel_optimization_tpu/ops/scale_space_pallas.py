"""Fused Pallas TPU kernel for the reference-mode scale-space + DoG octave.

This one kernel subsumes the reference's entire SIMD x thread parallelism
matrix (SURVEY.md section 2): the innermost NEON/SSE/AVX/AVX-512 vector loops
(GaussDePyramid-NEON.h:131-156, GaussDePyramid-AVX512xPTHREAD.h:218-253, ...)
become VPU lanes/sublanes; the pthread octave/scale splits
(GaussDePyramid-pThread.h:211-308) and OpenMP row schedules
(GaussDePyramid-OpenMP.h:164-175) become the kernel grid over row tiles.

Why a custom kernel wins over the reference's structure: the reference makes
2*(S+3) multiply passes + (S+2) subtract passes over each octave image —
~3.4x redundant HBM traffic at S=2. Here each base-image tile is read into
VMEM ONCE and all S+2 DoG planes plus the top windowed scale are produced in
one pass. HBM traffic = read N^2 + write (S+3)*N^2, which is output-bound —
the speed-of-light for this op.

STATUS vs the jnp path: honest device-chained benchmarks (BASELINE.md)
show XLA fuses core/pyramid_ref.reference_dog_octave into an equivalent
single pass, and at sub-512 sizes feeding this kernel from a reshaped
producer forces a layout conversion that XLA's own fusion avoids — so the
fused-jnp pipeline (with batched tail octaves) is the DEFAULT production
path and this kernel is kept as a validated alternative backend
(equivalence-tested in tests/test_scale_space_pallas.py; it matches the
jnp path at 512 and wins nothing overall). The Pallas win on this pipeline
is the descriptor patch DMA gather (ops/patch_gather.py), not the stencil.

Math (see core/pyramid_ref.py): every scale starts as the same base tile and
the "filter" is a separable window, so
    DoG_s = base * (f_s (x) f_s - f_{s+1} (x) f_{s+1})
with the filter bank f precomputed on device ((S+3, N) — tiny).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sift_parallel_optimization_tpu.core.pyramid_ref import reference_filter_bank

# Row-tile height. 256 rows x up to 1024 cols x ~6 scale planes of f32 stays
# well under the ~16 MB/core VMEM budget while giving the VPU (8,128) tiles
# plenty of work per grid step.
_DEFAULT_TILE_ROWS = 256
_MIN_PALLAS_SIZE = 128  # below this, XLA's fused jnp path is already optimal


def _octave_kernel(n_scales: int, base_ref, frow_ref, fcol_ref, out_ref):
    """Grid step: one (tile_rows, N) slab of the base image -> all planes.

    base_ref: (tile_rows, N) VMEM tile of the octave base image.
    frow_ref: (n_scales, tile_rows) per-scale window slice along rows.
    fcol_ref: (n_scales, N) per-scale window along columns.
    out_ref:  (n_scales, tile_rows, N) output planes (DoG + top scale).
    """
    base = base_ref[:]  # (T, N), read once, reused for every scale
    prev = None
    for s in range(n_scales):
        # Separable window for scale s on this tile: outer(f_row, f_col).
        w = frow_ref[s, :][:, None] * fcol_ref[s, :][None, :]
        g = base * w
        if s > 0:
            # DoG plane s-1 = G_{s-1} - G_s (GuassDePyramid.h:140-146).
            out_ref[s - 1, :, :] = prev - g
        prev = g
    out_ref[n_scales - 1, :, :] = prev  # top scale keeps the windowed image


def _pick_tile_rows(size: int) -> int:
    if size <= _DEFAULT_TILE_ROWS:
        return size
    # Largest power-of-two divisor tile <= default (sizes are powers of two
    # in the reference drivers). The tile MUST divide the size — the grid
    # floors — and be sublane-aligned; otherwise fall back to one
    # full-height tile (a block equal to the array dim is always legal).
    t = _DEFAULT_TILE_ROWS
    while t > 1 and size % t:
        t //= 2
    return t if t >= 8 else size


@functools.partial(jax.jit, static_argnames=("n_scales", "tile_rows"))
def reference_dog_octave_pallas(
    base: jax.Array, n_scales: int, tile_rows: int | None = None
) -> jax.Array:
    """(N, N) octave base -> (n_scales, N, N); planes [0:S+2] DoG, [S+2] top.

    Bit-compatible with core.pyramid_ref.reference_dog_octave (tested in
    tests/test_scale_space_pallas.py). Octaves smaller than the VPU tile
    fall back to the jnp path — XLA already emits optimal code there and
    Pallas tiling constraints don't pay off below (8, 128).
    """
    size = base.shape[-1]
    if size < _MIN_PALLAS_SIZE:
        from sift_parallel_optimization_tpu.core.pyramid_ref import (
            reference_dog_octave,
        )

        return reference_dog_octave(base, n_scales - 3)

    if tile_rows is None:
        tile_rows = _pick_tile_rows(size)
    grid = (size // tile_rows,)
    f = reference_filter_bank(size, n_scales, dtype=base.dtype)  # (S+3, N)

    kernel = functools.partial(_octave_kernel, n_scales)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_rows, size), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_scales, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_scales, size), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_scales, tile_rows, size),
            lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_scales, size, size), base.dtype),
        cost_estimate=pl.CostEstimate(
            flops=3 * n_scales * size * size,
            bytes_accessed=(1 + n_scales) * size * size * base.dtype.itemsize,
            transcendentals=0,
        ),
    )(base, f, f)


def reference_dog_pyramid_pallas(
    img: jax.Array, S: int, n_octaves: int | None = None
) -> list[jax.Array]:
    """Full REFERENCE-mode pyramid via the fused kernel (jnp for tiny octaves).

    Drop-in replacement for core.pyramid_ref.reference_dog_pyramid.
    """
    from sift_parallel_optimization_tpu.config import num_octaves
    from sift_parallel_optimization_tpu.core.pyramid_ref import reference_subsample

    img = img.astype(jnp.float32)
    total = num_octaves(img.shape[0])
    if n_octaves is None:
        n_octaves = total
    n_octaves = min(n_octaves, total)
    return [
        reference_dog_octave_pallas(reference_subsample(img, o), S + 3)
        for o in range(n_octaves)
    ]
