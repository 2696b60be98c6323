"""Fused score-table kernel vs the jnp dense-score reference (interpret
mode — the on-chip run is exercised by the detection path in
tools/tpu_sanity.py's recall check)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sift_parallel_optimization_tpu.models.detect import (
    CONTRAST_THRESHOLD,
    EDGE_RATIO,
    _dense_score,
)
from sift_parallel_optimization_tpu.models.frontend import sift_config
from sift_parallel_optimization_tpu.ops.detect_fused import (
    SPAN,
    fused_score_tables,
    pad_dog,
    supports,
)


def _reference_tables(score: np.ndarray):
    """Per-(plane, row, 64-lane-span) (max, first-argmax flat idx)."""
    s, hs, ws = score.shape
    w = ws + 2
    out = {}
    for scp in range(s):
        for ry in range(hs):
            for g in range((w + SPAN - 1) // SPAN):
                lo, hi = g * SPAN, min((g + 1) * SPAN, ws)
                if lo >= ws:
                    continue
                seg = score[scp, ry, lo:hi]
                m = float(seg.max()) if seg.size else 0.0
                col = lo + int(seg.argmax()) if m > 0 else None
                out[(scp, ry, g)] = (m, col)
    return out


@pytest.mark.parametrize("shape", [(128, 128), (192, 256)])
# NOTE: 192 % 64 == 0 so both shapes are kernel-eligible.
def test_tables_match_dense_score(rng, shape):
    h, w = shape
    cfg = sift_config(256)
    dog = jnp.asarray(
        0.2 * rng.normal(size=(cfg.S + 2, h, w)).astype(np.float32)
    )
    assert supports(dog.shape)
    thr = CONTRAST_THRESHOLD / cfg.S
    tv, ti = fused_score_tables(
        pad_dog(dog), cfg.S, thr, EDGE_RATIO, interpret=True
    )
    score = np.asarray(_dense_score(dog, cfg, CONTRAST_THRESHOLD,
                                    EDGE_RATIO, refine_iters=1))
    ref = _reference_tables(score)

    tv, ti = np.asarray(tv), np.asarray(ti)
    s, hs, ws = score.shape
    hs_p = hs + 8          # ti addresses the padded score volume
    got = {}
    for v, i in zip(tv, ti):
        scp, rem = divmod(int(i), hs_p * ws)
        ry, col = divmod(rem, ws)
        g = col // SPAN
        key = (scp, ry, g)
        if v > 0:
            # No duplicate positive entries for one span.
            assert key not in got or got[key] == (float(v), col), key
            got[key] = (float(v), col)

    # Same expressions, but separately compiled XLA programs contract
    # FMAs differently — values agree to fp noise, and borderline
    # candidates (gates within noise of their thresholds) may flip.
    pos_ref = {k for k, (m, _) in ref.items() if m > 0}
    flips = len(pos_ref ^ set(got))
    assert flips <= max(2, 0.01 * len(pos_ref)), (flips, len(pos_ref))
    for key in set(got) & pos_ref:
        v, col = got[key]
        m, ref_col = ref[key]
        np.testing.assert_allclose(v, m, rtol=1e-5)
        if col != ref_col:
            # A within-noise argmax tie: both voxels carry ~the max.
            scp, ry, _ = key
            assert abs(score[scp, ry, col] - m) <= 1e-5 * m, (
                key, col, ref_col
            )
    assert len(pos_ref) > 10, "test volume too sparse to be meaningful"


def test_unsupported_shapes_rejected():
    assert not supports((5, 64, 64))     # W < 128
    assert not supports((5, 32, 128))    # H < BLOCK_ROWS
    assert not supports((5, 200, 256))   # H not a block multiple
    assert supports((5, 128, 128))
    with pytest.raises(ValueError):
        fused_score_tables(
            pad_dog(jnp.zeros((5, 64, 64))), 3, 0.01, interpret=True
        )
