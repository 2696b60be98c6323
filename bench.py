"""Headline benchmark: scale-space pyramid + DoG, ms/frame on one chip.

This is the reference's own headline measurement — mean ms per full
pyramid+DoG pass at 512x512, S=2 (reference: main.cpp:60-74 repeats
GenerateDoG until 100 ms accumulated and prints the mean) — re-grounded on
TPU. The baseline number is the reference's C++ compiled with
``-O3 -march=native`` on this host (see BASELINE.md):

  * serial GuassDePyramid.h GenerateDoG:     2.80 ms/frame
  * best parallel variant (pthread x7):      2.52 ms/frame  <- baseline

``vs_baseline`` is the speedup over the reference's BEST variant.

Measurement method (honest under the axon relay): this environment's
`block_until_ready` resolves before device work completes, and every
host->device round trip costs a variable ~0.1-32 ms. So iterations are
CHAINED ON DEVICE with `lax.scan` (a data dependency through the carry
keeps XLA from eliding or hoisting the work, and summing EVERY octave
keeps them all live) and the per-frame time is the SLOPE between two chain
lengths — fixed round-trip cost cancels. Each total is forced with a
scalar fetch, best of several samples.

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
CHAIN_LO = 50
CHAIN_HI = 400


def main() -> None:
    from jax import lax

    from sift_parallel_optimization_tpu.core.pyramid_ref import (
        reference_dog_pyramid,
    )

    img = jnp.asarray(
        np.random.default_rng(0).random((SIZE, SIZE), np.float32)
    )

    def chained_total_ms(chain: int) -> float:
        @jax.jit
        def chained(x):
            def body(c, _):
                out = reference_dog_pyramid(c, S)
                dep = sum(o.sum() for o in out)
                return c + 1e-30 * dep, None
            c, _ = lax.scan(body, x, None, length=chain)
            return c.sum()

        float(chained(img))  # compile + warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(chained(img))  # scalar fetch forces completion
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    lo = chained_total_ms(CHAIN_LO)
    hi = chained_total_ms(CHAIN_HI)
    ms = max((hi - lo) / (CHAIN_HI - CHAIN_LO), 1e-6)

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
