"""Variant-equivalence tests: the fused Pallas kernel vs the jnp golden path.

The analogue of the cross-variant checks the reference never had — every
kernel/sharding configuration must bit-compare against the single-device
semantics (SURVEY.md section 4). On CPU the kernel runs in interpreter mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sift_parallel_optimization_tpu.core.numpy_golden import golden_dog_pyramid
from sift_parallel_optimization_tpu.core.pyramid_ref import (
    reference_dog_octave,
    reference_dog_pyramid,
)
import sift_parallel_optimization_tpu.ops.scale_space_pallas as ssp


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # Tests run on CPU: force Pallas interpreter mode and drop the size gate
    # so the kernel path itself is what gets exercised.
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(ssp, "_MIN_PALLAS_SIZE", 0)
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("size,S", [(16, 2), (32, 3), (64, 1)])
def test_pallas_octave_matches_jnp(size, S, rng):
    base = jnp.asarray(rng.normal(size=(size, size)).astype(np.float32))
    want = reference_dog_octave(base, S)
    got = ssp.reference_dog_octave_pallas(base, S + 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_pallas_octave_tiled_grid(rng):
    # Force a multi-step grid (tile_rows < size) to exercise the index maps.
    base = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
    want = reference_dog_octave(base, 2)
    got = ssp.reference_dog_octave_pallas(base, 5, tile_rows=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_pallas_pyramid_matches_golden(rng):
    img = rng.integers(0, 256, size=(32, 32)).astype(np.float32)
    golden = golden_dog_pyramid(img, 2)
    got = ssp.reference_dog_pyramid_pallas(jnp.asarray(img), 2)
    assert len(got) == len(golden)
    for o, (g, u) in enumerate(zip(golden, got)):
        np.testing.assert_allclose(
            np.asarray(u), g, rtol=1e-3, atol=1e-4, err_msg=f"octave {o}"
        )
