"""On-chip attribution of propose_archive_loop (the loop stage)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sift_parallel_optimization_tpu.models.frontend import (
    extract_features,
    sift_config,
)
from sift_parallel_optimization_tpu.models.matching import match_descriptors
from sift_parallel_optimization_tpu.models.odometry import (
    accept_loop_proposal,
    empty_archive,
    empty_loop_buffer,
    propose_archive_loop,
)
from sift_parallel_optimization_tpu.models.sfm import ransac_pnp
from sift_parallel_optimization_tpu.utils import native

size, B = 256, 128
focal = float(size)
cfg = sift_config(size)
K = jnp.array(
    [[focal, 0, size / 2], [0, focal, size / 2], [0, 0, 1.0]], jnp.float32
)
fe = jax.jit(lambda x: extract_features(x, cfg, B * 2, dual_orientation=True))
feats = fe(jnp.asarray(native.render_frame(
    size, np.zeros(3, np.float32), np.zeros(3, np.float32), focal, seed=2)))
A = 64 * B
rng = np.random.default_rng(1)
d = rng.normal(size=(A, 128)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
arch = empty_archive(A)._replace(
    positions=jnp.asarray(rng.normal(size=(A, 3)).astype(np.float32) + [0, 0, 5]),
    desc=jnp.asarray(d),
    birth=jnp.zeros(A, jnp.int32),
    valid=jnp.ones(A, bool),
)
buf = empty_loop_buffer(64)
key = jax.random.key(0)
uv = jnp.stack([feats.keypoints.x, feats.keypoints.y], -1)


def chain_ms(step, label):
    def chain(n):
        @jax.jit
        def run(x):
            def body(c, _):
                return step(c), None
            out, _ = lax.scan(body, x, None, length=n)
            return out
        float(run(jnp.zeros(()))); return run

    def tot(f):
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter(); float(f(jnp.zeros(())))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    lo, hi = 8, 32
    t = tot(chain(hi))
    if t < 60:
        s = int(60 / max(t, 1e-3)) + 1
        lo, hi = lo * s, hi * s
    print(f"{label:34s} {(tot(chain(hi)) - tot(chain(lo))) / (hi - lo):8.4f} ms",
          flush=True)


def s_full(x):
    prop = propose_archive_loop(
        key, feats, arch._replace(positions=arch.positions + x * 1e-20),
        jnp.asarray(50, jnp.int32), K, min_gap=7,
    )
    b = accept_loop_proposal(buf, prop, jnp.asarray(50, jnp.int32), 25, 3)
    return x + 1e-20 * (b.tvecs.sum() + prop.rvec.sum() + prop.birth)


def s_match(x):
    m = match_descriptors(
        feats.descriptors + x * 1e-20, arch.desc,
        feats.keypoints.valid, arch.valid,
    )
    return x + 1e-20 * (m.similarity.sum() + m.idx2.sum())


def s_pnp(x):
    pts3d = arch.positions[jnp.arange(uv.shape[0]) % A]
    cam, inl, n = ransac_pnp(
        key, pts3d + x * 1e-20, uv, jnp.ones(uv.shape[0], bool), K
    )
    return x + 1e-20 * (cam.rvec.sum() + n)


def s_median(x):
    births = arch.birth[jnp.arange(uv.shape[0]) % A]
    keep = feats.keypoints.valid
    cnt = jnp.maximum(keep.sum(), 1)
    b_sorted = jnp.sort(jnp.where(keep, births + (x * 1e-20).astype(jnp.int32), 2**30))
    birth = b_sorted[jnp.clip((cnt - 1) // 2, 0, births.shape[0] - 1)]
    return x + 1e-20 * birth


chain_ms(s_full, "propose + accept (full)")
chain_ms(s_match, "match 256 x 8192")
chain_ms(s_pnp, "ransac_pnp (256 pts)")
chain_ms(s_median, "median birth sort")
