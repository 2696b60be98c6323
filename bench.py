"""Headline benchmark: scale-space pyramid + DoG, ms/frame on one chip.

This is the reference's own headline measurement — mean ms per full
pyramid+DoG pass at 512x512, S=2 (reference: main.cpp:60-74 repeats
GenerateDoG until 100 ms accumulated and prints the mean) — re-grounded on
TPU. The baseline number is the reference's C++ compiled with
``-O3 -march=native`` on this host (see BASELINE.md):

  * serial GuassDePyramid.h GenerateDoG:     2.80 ms/frame
  * best parallel variant (pthread x7):      2.52 ms/frame  <- baseline

``vs_baseline`` is the speedup over the reference's BEST variant.

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Reference's best self-measured variant on this host's CPU (BASELINE.md):
# pthread THREAD_COUNT=7 (GaussDePyramid-pThread.h:176-254), -O3 -march=native.
BASELINE_BEST_MS = 2.52

SIZE = 512
S = 2


def main() -> None:
    from sift_parallel_optimization_tpu.ops.scale_space_pallas import (
        reference_dog_pyramid_pallas,
    )

    img = jnp.asarray(
        np.random.default_rng(0).random((SIZE, SIZE), np.float32)
    )
    fn = jax.jit(lambda x: reference_dog_pyramid_pallas(x, S))
    jax.block_until_ready(fn(img))  # compile

    # Steady-state timing: repeat until >=2 s accumulated (the reference's
    # repeat-until-threshold pattern, main.cpp:66-73, at 20x the budget).
    t0 = time.perf_counter()
    runs = 0
    while time.perf_counter() - t0 < 2.0:
        jax.block_until_ready(fn(img))
        runs += 1
    ms = (time.perf_counter() - t0) / runs * 1e3

    print(
        json.dumps(
            {
                "metric": "pyramid_dog_ms_per_frame_512",
                "value": round(ms, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_BEST_MS / ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
