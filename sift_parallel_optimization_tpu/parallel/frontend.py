"""Data-parallel batched frontend: frames sharded over the mesh.

The throughput path (BASELINE.json: frames/s scaling 1 chip -> 1 host ->
N hosts at >=80% efficiency). Scaling over frames is pure DP with zero
cross-frame communication — the ideal-scaling regime the reference's MPI
design (one collector rank, SURVEY.md section 2) could never reach.

How the local batched program is built (every choice measured on v5e at
256^2, K=256, chained-slope timing; B=1 per-frame reference = 0.283 ms):

* plain ``vmap`` of the per-frame frontend: 1.12 ms/frame at B=4 (4x).
  vmap turns the detection stage's flat 1-D ``approx_max_k`` and scalar
  gathers into slow batched lowerings, and — the dominant cost — XLA
  materializes the batched stage boundaries with loop-based relayout
  copies (tiled 5-D -> linear 1-D) and non-in-place concats of the
  padded detection canvas and descriptor atlas (~2 ms/iter of pure data
  movement in the profile).
* batch-aware sparse stage (``detect_pyramid_batched``: per-frame 1-D
  top-k unrolled, one frame-major flat gather) + vmapped descriptors:
  0.78 ms/frame at B=4 — beats vmap 1.4x but still loses to per-frame;
  the relayout/concat pathology persists at every batched boundary.
* frame-folded descriptor stage (frames concatenated into the keypoint
  axis, one B*K-keypoint einsum batch): 0.35 ms/frame at B=4 — close,
  but the (B*R, C) atlas concat still costs more than it saves.
* THIS design — vmapped dense pyramid + per-frame UNROLLED detection and
  description: 0.293 ms/frame at B=4, 0.32 at B=8. The pyramid batches
  perfectly (0.028 -> 0.021 ms/frame: bigger blur einsums, better MXU
  utilization); everything sparse stays in its measured-optimal
  per-frame form, B independent subprograms in ONE launch. XLA
  schedules them; per-frame cost is within 4% of the B=1 program.

The win over B separate per-frame calls is the launch amortization (one
dispatch, one outer scan-able program instead of B round trips) and, with
a mesh, the shard_map form: each device runs exactly this single-chip
batched program on its local frame shard — not GSPMD's partitioning of a
vmapped one.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from sift_parallel_optimization_tpu.config import PyramidConfig
from sift_parallel_optimization_tpu.core.pyramid_ref import (
    sift_gaussian_pyramid,
)
from sift_parallel_optimization_tpu.models.descriptor import (
    orient_and_describe,
)
from sift_parallel_optimization_tpu.models.detect import detect_pyramid
from sift_parallel_optimization_tpu.models.frontend import Features


def _batched_frontend(
    imgs: jax.Array,
    cfg: PyramidConfig,
    max_keypoints: int,
    dual_orientation: bool,
    thresholds: dict,
) -> Features:
    """(B, H, W) -> Features with leading batch axis, single device."""
    b = imgs.shape[0]
    gauss = jax.vmap(lambda im: sift_gaussian_pyramid(im, cfg))(imgs)
    per_frame = []
    for i in range(b):
        g_i = [a[i] for a in gauss]
        dogs = [a[1:] - a[:-1] for a in g_i]
        kp = detect_pyramid(dogs, cfg, max_keypoints, **thresholds)
        kp, desc = orient_and_describe(
            g_i, kp, dual_orientation=dual_orientation
        )
        per_frame.append(Features(keypoints=kp, descriptors=desc))
    return jax.tree.map(lambda *xs: jax.numpy.stack(xs), *per_frame)


def batched_extract_features(
    imgs: jax.Array,
    cfg: PyramidConfig,
    max_keypoints: int = 512,
    mesh: Mesh | None = None,
    dual_orientation: bool = False,
    **thresholds,
) -> Features:
    """(B, H, W) frames -> Features with leading batch axis.

    With ``mesh``, frames are sharded over its ``data`` axis (B must be a
    multiple of it) and each device runs the batch-aware single-chip
    program on its local shard; without, the same program runs on one
    device.
    """
    if mesh is None:
        return _batched_frontend(
            imgs, cfg, max_keypoints, dual_orientation, thresholds
        )
    from jax import shard_map

    fn = shard_map(
        lambda x: _batched_frontend(
            x, cfg, max_keypoints, dual_orientation, thresholds
        ),
        mesh=mesh,
        in_specs=P("data", None, None),
        out_specs=P("data"),
    )
    return fn(imgs)
