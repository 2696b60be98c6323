"""On-chip per-stage attribution of the scan-fused tracking step."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sift_parallel_optimization_tpu.models.frontend import (
    extract_features,
    sift_config,
)
from sift_parallel_optimization_tpu.models.sfm import (
    empty_map,
    init_two_view,
    register_frame,
)
from sift_parallel_optimization_tpu.models.ba import (
    bundle_adjust,
    empty_anchors,
    resolve_solver,
)
from sift_parallel_optimization_tpu.models.odometry import (
    harvest_anchors,
    shift_window,
)
from sift_parallel_optimization_tpu.utils import native

size, W, B, ba_iters = 256, 6, 128, 4
focal = float(size)
cfg = sift_config(size)
K = jnp.array(
    [[focal, 0, size / 2], [0, focal, size / 2], [0, 0, 1.0]], jnp.float32
)
fe = jax.jit(lambda x: extract_features(x, cfg, B * 2, dual_orientation=True))
rvs = np.stack([[0.0, 0.02 * i, 0.0] for i in range(3)], 0)
tvs = np.stack([[-0.3 * i, 0.0, 0.03 * i] for i in range(3)], 0)
feats = [
    fe(jnp.asarray(native.render_frame(
        size, rvs[i].astype(np.float32), tvs[i].astype(np.float32),
        focal, seed=2)))
    for i in range(3)
]
key = jax.random.key(0)
m0 = empty_map(W, B, max_loops=0)
m0, used0 = init_two_view(key, feats[0], feats[1], K, m0, B)
m0, used0 = register_frame(key, m0, feats[2], feats[1], 2, K, used0, B)
solver = resolve_solver(W, W * B, "auto")
ba = functools.partial(
    bundle_adjust, n_iters=ba_iters, damping=1e-4, huber_delta=2.0,
    solver=solver,
    **({"max_obs_per_point": -(-W // 8) * 8} if solver == "cg" else {}),
)
anchors0 = empty_anchors((W - 1) * B)
slot = min(2, W - 1)


def make_body(do_harvest, do_shift, do_reg, do_ba):
    def body(carry, _):
        mm, uu, anc = carry
        if do_harvest:
            anc = harvest_anchors(mm, anc, B, per_eviction=B)
        if do_shift:
            mm = shift_window(mm, B)
        if do_reg:
            mm, uu = register_frame(key, mm, feats[2], feats[1], slot, K, uu, B)
        if do_ba:
            st = ba(mm.ba_state(), mm.obs, K, anchors=anc)
            mm = mm._replace(rvecs=st.rvecs, tvecs=st.tvecs, points=st.points)
        return (mm, uu, anc), None
    return body


def chain_ms(body, label):
    def chain(n):
        @jax.jit
        def run(m, u):
            out, _ = lax.scan(body, (m, u, anchors0), None, length=n)
            return out[0].tvecs.sum() + out[0].points.sum()
        float(run(m0, used0))
        return run

    def total_ms(fn):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(fn(m0, used0))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    lo, hi = 4, 16
    t_hi = total_ms(chain(hi))
    if t_hi < 60.0:
        scale = int(60.0 / max(t_hi, 1e-3)) + 1
        lo, hi = lo * scale, hi * scale
    ms = max((total_ms(chain(hi)) - total_ms(chain(lo))) / (hi - lo), 1e-6)
    print(f"{label:34s} {ms:8.3f} ms/frame", flush=True)
    return ms


full = chain_ms(make_body(1, 1, 1, 1), "full (harvest+shift+reg+ba)")
chain_ms(make_body(1, 1, 1, 0), "no BA")
chain_ms(make_body(1, 1, 0, 1), "no register")
chain_ms(make_body(1, 1, 0, 0), "harvest+shift only")
chain_ms(make_body(0, 0, 1, 0), "register only")
chain_ms(make_body(0, 0, 0, 1), "BA only")
