"""On-chip attribution of the dense window-BA iteration (W=6)."""
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
from sift_parallel_optimization_tpu.models import ba as BA
from sift_parallel_optimization_tpu.models.ba import (
    bundle_adjust,
    empty_anchors,
)
from sift_parallel_optimization_tpu.utils import native

size, W, B = 256, 6, 128
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
anc = empty_anchors((W - 1) * B)
st0 = m0.ba_state()
obs = m0.obs


def chain_ms(step, label, x0):
    def chain(n):
        @jax.jit
        def run(x):
            def body(c, _):
                return step(c), None
            out, _ = lax.scan(body, x, None, length=n)
            return out
        float(run(x0))
        return run

    def total_ms(fn):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(fn(x0))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    lo, hi = 8, 32
    t_hi = total_ms(chain(hi))
    if t_hi < 60.0:
        scale = int(60.0 / max(t_hi, 1e-3)) + 1
        lo, hi = lo * scale, hi * scale
    ms = max((total_ms(chain(hi)) - total_ms(chain(lo))) / (hi - lo), 1e-6)
    print(f"{label:40s} {ms:8.4f} ms", flush=True)
    return ms


x0 = jnp.zeros((), jnp.float32)


def s_full(x):
    st = bundle_adjust(
        st0._replace(points=st0.points + x * 1e-20), obs, K,
        n_iters=4, damping=1e-4, huber_delta=2.0, solver="dense",
        anchors=anc,
    )
    return x + 1e-20 * (st.tvecs.sum() + st.points.sum())


def s_one_iter(x):
    st = bundle_adjust(
        st0._replace(points=st0.points + x * 1e-20), obs, K,
        n_iters=1, damping=1e-4, huber_delta=2.0, solver="dense",
        anchors=anc,
    )
    return x + 1e-20 * (st.tvecs.sum() + st.points.sum())


def s_assemble(x):
    blocks = BA.assemble_normal_blocks(
        st0._replace(points=st0.points + x * 1e-20), obs, K,
        huber_delta=2.0, anchors=anc,
    )
    return x + 1e-20 * (blocks.hcc.sum() + blocks.w.sum() + blocks.bp.sum())


blocks0 = jax.jit(lambda: BA.assemble_normal_blocks(
    st0, obs, K, huber_delta=2.0, anchors=anc))()


def s_solve(x):
    dc, dp = BA.solve_schur(
        blocks0._replace(bc=blocks0.bc + x * 1e-20), damping=1e-4
    )
    return x + 1e-20 * (dc.sum() + dp.sum())


def s_jac(x):
    jc, jp, r = BA._analytic_jacobians(
        st0._replace(points=st0.points + x * 1e-20), obs, K
    )
    return x + 1e-20 * (jc.sum() + jp.sum() + r.sum())


def s_wseg(x):
    jc, jp, r = BA._analytic_jacobians(
        st0._replace(points=st0.points + x * 1e-20), obs, K
    )
    C, P = W, W * B
    w_obs = jnp.einsum("mik,mil->mkl", jc, jp)
    seg = obs.cam_idx * P + obs.pt_idx
    w = jax.ops.segment_sum(w_obs.reshape(-1, 18), seg, C * P)
    return x + 1e-20 * w.sum()


chain_ms(s_full, "bundle_adjust 4 iters (dense, anchors)", x0)
chain_ms(s_one_iter, "bundle_adjust 1 iter", x0)
chain_ms(s_assemble, "assemble_normal_blocks", x0)
chain_ms(s_solve, "solve_schur", x0)
chain_ms(s_jac, "_analytic_jacobians", x0)
chain_ms(s_wseg, "jacobians + W segment_sum", x0)


def s_fori(x):
    from jax import lax as _lax

    def body(_, st):
        return BA.ba_step(
            st, obs, K, damping=1e-4, huber_delta=2.0,
            solver="dense", anchors=anc,
        )

    st = _lax.fori_loop(
        0, 4, body, st0._replace(points=st0.points + x * 1e-20)
    )
    return x + 1e-20 * (st.tvecs.sum() + st.points.sum())


def s_unrolled(x):
    st = st0._replace(points=st0.points + x * 1e-20)
    for k in range(4):
        st = BA.ba_step(
            st, obs, K, damping=1e-4, huber_delta=2.0,
            solver="dense", anchors=anc,
        )
    return x + 1e-20 * (st.tvecs.sum() + st.points.sum())


chain_ms(s_fori, "4 iters via fori_loop", x0)
chain_ms(s_unrolled, "4 iters unrolled", x0)
chain_ms(s_fori, "4 iters via fori_loop (repeat)", x0)
chain_ms(s_unrolled, "4 iters unrolled (repeat)", x0)
