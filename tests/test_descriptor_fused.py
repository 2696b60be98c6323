"""Fused gather+resample kernel vs the jnp reference path (interpret
mode — the hardware run is covered by tools/tpu_sanity.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from sift_parallel_optimization_tpu.models import descriptor as D
from sift_parallel_optimization_tpu.ops.descriptor_fused import (
    DESC_GRID,
    ORI_GRID,
    gather_resample_pallas,
)


def test_fused_kernel_matches_jnp_resample(rng):
    k = 8
    pr, pc = D.PATCH_ROWS, D.PATCH_COLS
    atlas = jnp.asarray(rng.random((512, 640), np.float32))
    grow = jnp.asarray(
        rng.integers(0, (512 - pr) // 16, k) * 16, jnp.int32
    )
    x0 = jnp.asarray(rng.integers(0, (640 - pc) // 128, k) * 128, jnp.int32)
    py = jnp.asarray(40.0 + 30.0 * rng.random(k), jnp.float32)
    px = jnp.asarray(100.0 + 50.0 * rng.random(k), jnp.float32)
    rad_o = jnp.asarray(5.0 + 30.0 * rng.random(k), jnp.float32)
    rad_d = jnp.asarray(5.0 + 40.0 * rng.random(k), jnp.float32)
    params = jnp.zeros((k, 128), jnp.float32)
    params = params.at[:, 0].set(py).at[:, 1].set(px)
    params = params.at[:, 2].set(rad_o).at[:, 3].set(rad_d)

    so, sd = gather_resample_pallas(atlas, grow, x0, params, interpret=True)

    patches = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(atlas, (y, x), (pr, pc))
    )(grow, x0)
    lin_o = jnp.linspace(-1.0, 1.0, ORI_GRID)
    lin_d = jnp.linspace(-1.0, 1.0, DESC_GRID)
    ref_o = D._resample(patches, py, px, lin_o[None] * rad_o[:, None])
    ref_d = D._resample(patches, py, px, lin_d[None] * rad_d[:, None])

    np.testing.assert_allclose(np.asarray(so), np.asarray(ref_o),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sd), np.asarray(ref_d),
                               atol=1e-5, rtol=1e-5)


def test_off_patch_offsets_are_zero(rng):
    """Sample offsets beyond the patch extent contribute zero (hat
    weights vanish) — matching _resample's semantics exactly."""
    atlas = jnp.asarray(rng.random((256, 512), np.float32))
    params = jnp.zeros((1, 128), jnp.float32)
    params = params.at[0, 0].set(4.0).at[0, 1].set(4.0)
    params = params.at[0, 2].set(200.0).at[0, 3].set(300.0)
    so, sd = gather_resample_pallas(
        atlas,
        jnp.zeros(1, jnp.int32),
        jnp.zeros(1, jnp.int32),
        params,
        interpret=True,
    )
    # Far-out rows/cols of the grids must be exactly zero.
    assert float(jnp.abs(so[0, 0]).max()) == 0.0
    assert float(jnp.abs(sd[0, -1]).max()) == 0.0
