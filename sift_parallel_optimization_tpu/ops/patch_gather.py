"""Pallas TPU kernel: per-keypoint patch gather via scalar-prefetched DMA.

The descriptor stage needs an axis-aligned patch around every keypoint
(models/descriptor.py). The XLA lowering of a vmapped `dynamic_slice` is
an element-granular gather running at ~20 GB/s effective; this kernel
instead issues ONE 2-D DMA per keypoint from the HBM-resident plane atlas
into the output block — the DMA engine moves whole rows, and the grid
pipeline overlaps each keypoint's copy with the previous block's
writeback. Keypoint offsets arrive through `PrefetchScalarGridSpec` so
each slice is known before its grid step launches the DMA, and they must
be tile-aligned (rows to 8 sublanes, cols to 128 lanes) for Mosaic to
prove the transfer legal — callers pre-align and absorb the remainder in
their resampling weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel2d(ys_ref, xs_ref, atlas_ref, out_ref, sem):
    k = pl.program_id(0)
    y0 = pl.multiple_of(ys_ref[k], 8)
    x0 = pl.multiple_of(xs_ref[k], 128)
    ph, pw = out_ref.shape[-2], out_ref.shape[-1]
    copy = pltpu.make_async_copy(
        atlas_ref.at[pl.ds(y0, ph), pl.ds(x0, pw)],
        out_ref.at[0],
        sem,
    )
    copy.start()
    copy.wait()


@functools.partial(jax.jit, static_argnames=("rows", "cols"))
def extract_atlas_patches_pallas(
    atlas: jax.Array,
    ys: jax.Array,
    xs: jax.Array,
    rows: int,
    cols: int,
) -> jax.Array:
    """(R, C) atlas + (K,) aligned offsets -> (K, rows, cols) patches.

    ``ys`` must be multiples of 8, ``xs`` multiples of 128, with
    ys <= R - rows and xs <= C - cols (callers align + clamp).
    """
    k = ys.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, rows, cols), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _kernel2d,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, rows, cols), atlas.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ys.astype(jnp.int32), xs.astype(jnp.int32), atlas)


def extract_atlas_patches_slice(
    atlas: jax.Array,
    ys: jax.Array,
    xs: jax.Array,
    rows: int,
    cols: int,
) -> jax.Array:
    """XLA fallback (vmapped dynamic_slice) — used off-TPU; bit-identical."""
    import jax.lax as lax

    def one(y0, x0):
        return lax.dynamic_slice(atlas, (y0, x0), (rows, cols))

    return jax.vmap(one)(ys.astype(jnp.int32), xs.astype(jnp.int32))


def extract_atlas_patches(
    atlas: jax.Array, ys: jax.Array, xs: jax.Array, rows: int, cols: int
) -> jax.Array:
    """Backend dispatch: DMA kernel on TPU, dynamic_slice elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return extract_atlas_patches_pallas(atlas, ys, xs, rows, cols)
    return extract_atlas_patches_slice(atlas, ys, xs, rows, cols)
