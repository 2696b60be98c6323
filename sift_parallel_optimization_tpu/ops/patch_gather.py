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


# In-flight DMA window. Each 112x256 f32 patch is ~115 KB; 8 in flight
# keeps the DMA engine saturated without pressuring VMEM (the copies are
# HBM -> HBM, only descriptors + semaphores live on-core).
_DEPTH = 8


def _kernel2d(ys_ref, xs_ref, atlas_ref, out_ref, sems, *, sub: int):
    k = pl.program_id(0)
    n = pl.num_programs(0)
    ph, pw = out_ref.shape[-2], out_ref.shape[-1]

    def mk(j):
        y0 = pl.multiple_of(ys_ref[j], sub)
        x0 = pl.multiple_of(xs_ref[j], 128)
        return pltpu.make_async_copy(
            atlas_ref.at[pl.ds(y0, ph), pl.ds(x0, pw)],
            out_ref.at[j],
            sems.at[j % _DEPTH],
        )

    # Keep up to _DEPTH copies in flight: start this step's DMA, wait for
    # the one issued _DEPTH-1 steps ago (its semaphore slot is about to be
    # reused). A start/wait pair per step serializes on DMA latency and
    # ran ~5x slower at B*K = 2048.
    mk(k).start()

    @pl.when(k >= _DEPTH - 1)
    def _():
        mk(k - (_DEPTH - 1)).wait()

    # Drain: the last step waits on every still-outstanding copy — those
    # never reached by the steady-state wait (j > n - _DEPTH). The grid
    # size n is static, so this is a plain Python loop.
    @pl.when(k == n - 1)
    def _():
        for j in range(max(0, n - _DEPTH + 1), n):
            mk(j).wait()


@functools.partial(jax.jit, static_argnames=("rows", "cols"))
def extract_atlas_patches_pallas(
    atlas: jax.Array,
    ys: jax.Array,
    xs: jax.Array,
    rows: int,
    cols: int,
) -> jax.Array:
    """(R, C) atlas + (K,) aligned offsets -> (K, rows, cols) patches.

    ``ys`` must be multiples of the dtype's sublane tile height (8 for
    4-byte dtypes, 16 for bf16), ``xs`` multiples of 128, with
    ys <= R - rows and xs <= C - cols (callers align + clamp).
    """
    k = ys.shape[0]
    sub = 16 if jnp.dtype(atlas.dtype).itemsize < 4 else 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_DEPTH,))],
    )
    return pl.pallas_call(
        functools.partial(_kernel2d, sub=sub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, rows, cols), atlas.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ys.astype(jnp.int32), xs.astype(jnp.int32), atlas)


def extract_atlas_patches_batched_pallas(
    atlas: jax.Array,
    ys: jax.Array,
    xs: jax.Array,
    rows: int,
    cols: int,
) -> jax.Array:
    """(B, R, C) atlases + (B, K) offsets -> (B, K, rows, cols).

    The batch collapses into the ROW axis: (B, R, C) -> (B*R, C) is a
    free reshape (contiguous), per-frame row offsets shift by b*R, and
    the pipelined 1-D-grid kernel runs over all B*K patches — one DMA
    window across the whole frame batch instead of whatever vmap makes
    of the scalar-prefetch kernel (which is what made the batched
    frontend LOSE on one chip). Requires R % 8 == 0, which
    models/descriptor.build_atlas guarantees (ROW_PAD and every padded
    plane height are sublane multiples).
    """
    b, r, c = atlas.shape
    sub = 16 if jnp.dtype(atlas.dtype).itemsize < 4 else 8
    if r % sub:
        raise ValueError(f"atlas rows ({r}) must be a sublane multiple")
    k = ys.shape[1]
    row_base = (jnp.arange(b, dtype=jnp.int32) * r)[:, None]
    out = extract_atlas_patches_pallas(
        atlas.reshape(b * r, c),
        (ys.astype(jnp.int32) + row_base).reshape(-1),
        xs.reshape(-1),
        rows,
        cols,
    )
    return out.reshape(b, k, rows, cols)


@functools.lru_cache(maxsize=None)
def _pallas_gather(rows: int, cols: int):
    """custom_vmap wrapper: vmapping the per-frame gather dispatches to
    the 2-D-grid batched kernel instead of vmap's generic pallas rule."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def gather(atlas, ys, xs):
        return extract_atlas_patches_pallas(atlas, ys, xs, rows, cols)

    @gather.def_vmap
    def _rule(axis_size, in_batched, atlas, ys, xs):
        atlas_b, ys_b, xs_b = in_batched
        if not ys_b:
            ys = jnp.broadcast_to(ys, (axis_size,) + ys.shape)
        if not xs_b:
            xs = jnp.broadcast_to(xs, (axis_size,) + xs.shape)
        if not atlas_b:
            # One shared atlas: flatten the batch into the keypoint grid.
            b, k = ys.shape
            out = extract_atlas_patches_pallas(
                atlas, ys.reshape(-1), xs.reshape(-1), rows, cols
            ).reshape(b, k, rows, cols)
        else:
            out = extract_atlas_patches_batched_pallas(
                atlas, ys, xs, rows, cols
            )
        return out, True

    return gather


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
        return _pallas_gather(rows, cols)(atlas, ys, xs)
    return extract_atlas_patches_slice(atlas, ys, xs, rows, cols)
