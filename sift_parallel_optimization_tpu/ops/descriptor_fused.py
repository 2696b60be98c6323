"""Fused Pallas kernel: patch DMA -> bilinear resample, entirely in VMEM.

MEASURED RESULT (v5e, chained-slope, K=512 at 512^2): this kernel LOSES
to the default patches+einsum path — 0.29 ms vs 0.11 ms — and is
therefore NOT the production path (models/descriptor.USE_FUSED_SAMPLING
gates it). The hypothesis was that killing the (K, 112, 256) patch
tensor's HBM round trip (~59 MB written + read twice) would win; in
practice the 2-deep DMA pipeline of ops/patch_gather.py already hides
that traffic, while this kernel's 512 sequential grid steps of tiny
(18..26, 112)x(112, 256) matmuls use a few percent of the MXU that one
big batched einsum saturates. Kept, tested (interpret-mode equivalence +
tools/tpu_sanity.py on hardware), as the negative result of the kernel
study — same role as ops/scale_space_pallas.py.

Mechanics: each grid step DMAs one keypoint's patch into a
double-buffered VMEM scratch slab (the next keypoint's copy is in
flight while the current one computes), builds the separable bilinear
hat weights on the VPU, and runs the two resample matmuls on the MXU —
only the (18, 18) orientation and (26, 26) descriptor sample grids ever
reach HBM.

This is the SIMD layer of the reference (GaussDePyramid-NEON.h:131-156 —
vectorized inner loops over the hot data) applied to the stage the
reference never had, with the DMA pipelining pattern of
ops/patch_gather.py extended through the compute.

Semantics match models/descriptor._resample exactly (hat weights over the
full patch extent, so off-patch sample offsets produce zeros); equivalence
is tested in interpret mode on CPU (tests/test_descriptor_fused.py) and on
hardware by tools/tpu_sanity.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Must match models/descriptor.py atlas geometry.
PATCH_ROWS = 128
PATCH_COLS = 256
ORI_GRID = 18
DESC_GRID = 26
OUT_COLS = 128             # one lane tile; cols >= grid size are zeros


def _hat(centers: jax.Array, extent: int, transpose: bool) -> jax.Array:
    """(G,) sample coords -> hat-weight matrix.

    transpose=False: (G, extent) row weights; True: (extent, G) col
    weights (built directly in the layout the matmul consumes)."""
    g = centers.shape[0]
    # Mosaic's iota is integer-only; build int32 and cast.
    if transpose:
        pix = lax.broadcasted_iota(jnp.int32, (extent, g), 0).astype(
            jnp.float32
        )
        c = centers[None, :]
    else:
        pix = lax.broadcasted_iota(jnp.int32, (g, extent), 1).astype(
            jnp.float32
        )
        c = centers[:, None]
    return jnp.maximum(0.0, 1.0 - jnp.abs(c - pix))


def _grid_coords(center: jax.Array, radius: jax.Array, g: int) -> jax.Array:
    """(G,) sample coordinates center + linspace(-1, 1, G) * radius."""
    lin = lax.iota(jnp.int32, g).astype(jnp.float32) * (2.0 / (g - 1)) - 1.0
    return center + lin * radius


def _resample_block(patch, py, px, rad, g):
    """(PR, PC) patch -> (g, OUT_COLS) separable bilinear resample.

    Columns >= g are exact zeros: their sample coordinate is forced to
    -2.0, outside every hat support. Padding inside the matmul keeps the
    kernel free of pad/concat/dynamic_update_slice, none of which lower
    to Mosaic; the MXU cost is identical (lanes are 128-padded anyway)."""
    cy = _grid_coords(py, rad, g)
    idx = lax.iota(jnp.int32, OUT_COLS).astype(jnp.float32)
    lin = idx * (2.0 / (g - 1)) - 1.0
    cx = jnp.where(idx < g, px + lin * rad, -2.0)       # (OUT_COLS,)
    ay = _hat(cy, PATCH_ROWS, transpose=False)          # (g, PR)
    pix = lax.broadcasted_iota(jnp.int32, (PATCH_COLS, OUT_COLS), 0).astype(
        jnp.float32
    )
    axt = jnp.maximum(0.0, 1.0 - jnp.abs(cx[None, :] - pix))
    t = lax.dot_general(
        ay, patch, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (g, PC)
    return lax.dot_general(
        t, axt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (g, OUT_COLS)


def _kernel(grow_ref, x0_ref, params_ref, atlas_ref, out_o_ref, out_d_ref,
            patch_buf, sems):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def copy(j, slot):
        y0 = pl.multiple_of(grow_ref[j], 16)
        x0 = pl.multiple_of(x0_ref[j], 128)
        return pltpu.make_async_copy(
            atlas_ref.at[pl.ds(y0, PATCH_ROWS), pl.ds(x0, PATCH_COLS)],
            patch_buf.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        copy(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        copy(i + 1, (i + 1) % 2).start()

    copy(i, i % 2).wait()
    patch = patch_buf[i % 2]

    py = params_ref[0, 0, 0]
    px = params_ref[0, 0, 1]
    rad_o = params_ref[0, 0, 2]
    rad_d = params_ref[0, 0, 3]

    out_o_ref[0] = _resample_block(patch, py, px, rad_o, ORI_GRID)
    out_d_ref[0] = _resample_block(patch, py, px, rad_d, DESC_GRID)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_resample_pallas(
    atlas: jax.Array,
    grow: jax.Array,
    x0: jax.Array,
    params: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused gather+resample for K keypoints.

    atlas: (R, C) plane atlas; grow/x0: (K,) tile-aligned patch origins
    (rows multiple of 8, cols of 128); params: (K, 128) f32 with columns
    [py, px, rad_ori, rad_desc, ...pad].

    Returns (samples_ori (K, 18, 18), samples_desc (K, 26, 26)).
    """
    k = grow.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k,),
        in_specs=[
            # (K, 1, 128) so the block's trailing dims (1, 128) equal the
            # array's — Mosaic rejects a (1, 128) block of a (K, 128) array.
            pl.BlockSpec((1, 1, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, ORI_GRID, OUT_COLS), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, DESC_GRID, OUT_COLS), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PATCH_ROWS, PATCH_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_o, out_d = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((k, ORI_GRID, OUT_COLS), jnp.float32),
            jax.ShapeDtypeStruct((k, DESC_GRID, OUT_COLS), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        grow.astype(jnp.int32), x0.astype(jnp.int32),
        params.astype(jnp.float32)[:, None, :], atlas.astype(jnp.float32),
    )
    return out_o[:, :, :ORI_GRID], out_d[:, :, :DESC_GRID]
