"""Why does the loop stage cost 1.5 ms in-scan but 0.3 standalone?"""
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
    accept_loop_proposal,
    archive_evicted_block,
    empty_archive,
    empty_loop_buffer,
    harvest_anchors,
    propose_archive_loop,
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
)
anc0 = empty_anchors((W - 1) * B)
A = 64 * B
rng = np.random.default_rng(1)
d = rng.normal(size=(A, 128)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
arch0 = empty_archive(A)._replace(
    positions=jnp.asarray(rng.normal(size=(A, 3)).astype(np.float32) + [0, 0, 5]),
    desc=jnp.asarray(d),
    birth=jnp.zeros(A, jnp.int32),
    valid=jnp.ones(A, bool),
)
buf0 = empty_loop_buffer(64)
fi = jnp.asarray(W + 1, jnp.int32)


def make_body(with_arch, loop_mode):
    """loop_mode: 'off' | 'cond' | 'direct' | 'propose_only'."""

    def body(carry, _):
        m, used, anc, arch, buf = carry
        if with_arch:
            arch = archive_evicted_block(arch, m, fi - W, fi - W, B)
        anc = harvest_anchors(m, anc, B, per_eviction=B)
        m = shift_window(m, B)
        m, used = register_frame(
            key, m, feats[2], feats[1], jnp.asarray(W - 1, jnp.int32),
            K, used, B,
        )
        st = ba(m.ba_state(), m.obs, K, anchors=anc)
        m = m._replace(rvecs=st.rvecs, tvecs=st.tvecs, points=st.points)

        def run_loop(b):
            prop = propose_archive_loop(
                key, feats[2], arch, fi, K, min_gap=W + 1
            )
            return accept_loop_proposal(b, prop, fi, 25, 3)

        if loop_mode == "cond":
            buf = lax.cond(fi > W, run_loop, lambda b: b, buf)
        elif loop_mode == "direct":
            buf = run_loop(buf)
        elif loop_mode == "propose_only":
            prop = propose_archive_loop(
                key, feats[2], arch, fi, K, min_gap=W + 1
            )
            buf = buf._replace(
                tvecs=buf.tvecs + 1e-20 * prop.tvec[None, :],
                count=buf.count + (prop.n_inliers * 0),
            )
        return (m, used, anc, arch, buf), None

    return body


def chain_ms(body, label):
    def chain(n):
        @jax.jit
        def run(m, u):
            (mm, _u, _a, arch_f, buf_f), _ = lax.scan(
                body, (m, u, anc0, arch0, buf0), None, length=n
            )
            return (mm.tvecs.sum() + mm.points.sum() + buf_f.tvecs.sum()
                    + buf_f.count + arch_f.positions.sum())
        float(run(m0, used0)); return run

    def tot(f):
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter(); float(f(m0, used0))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    lo, hi = 4, 16
    t = tot(chain(hi))
    if t < 60:
        s = int(60 / max(t, 1e-3)) + 1
        lo, hi = lo * s, hi * s
    print(f"{label:36s} {(tot(chain(hi)) - tot(chain(lo))) / (hi - lo):8.3f}"
          " ms/frame", flush=True)


chain_ms(make_body(True, "cond"), "arch + loop via cond")
chain_ms(make_body(True, "direct"), "arch + loop direct (no cond)")
chain_ms(make_body(True, "propose_only"), "arch + propose only")
chain_ms(make_body(True, "off"), "arch only, no loop")
chain_ms(make_body(False, "off"), "no arch, no loop")
