"""Data-parallel batched frontend: frames sharded over the mesh.

The throughput path (BASELINE.json: frames/s scaling 1 chip -> 1 host ->
N hosts at >=80% efficiency). The per-frame frontend is already one jitted
program with static shapes, so scaling is pure DP: `vmap` over a frame
batch + a `data`-axis sharding constraint, and GSPMD partitions the whole
pipeline with zero cross-frame communication — the ideal-scaling regime
the reference's MPI design (one collector rank, SURVEY.md section 2) could
never reach.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sift_parallel_optimization_tpu.config import PyramidConfig
from sift_parallel_optimization_tpu.models.frontend import (
    Features,
    extract_features,
)


def batched_extract_features(
    imgs: jax.Array,
    cfg: PyramidConfig,
    max_keypoints: int = 512,
    mesh: Mesh | None = None,
) -> Features:
    """(B, H, W) frames -> Features with leading batch axis.

    With ``mesh``, frames are sharded over its ``data`` axis (B must
    divide it); without, plain vmap on one device.
    """
    if mesh is not None:
        imgs = jax.lax.with_sharding_constraint(
            imgs, NamedSharding(mesh, P("data", None, None))
        )
    feats = jax.vmap(
        lambda im: extract_features(im, cfg, max_keypoints)
    )(imgs)
    if mesh is not None:
        feats = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("data"))
            ),
            feats,
        )
    return feats
