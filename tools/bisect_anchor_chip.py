"""Bisect the chip-only anchored-odometry regression: manual round-4
style per-frame driver vs the round-5 fused-scan driver, same inputs."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools

import jax
import jax.numpy as jnp
import numpy as np

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
    run_odometry,
    shift_window,
)
from sift_parallel_optimization_tpu.utils import native
from sift_parallel_optimization_tpu.utils.trajectory import (
    ate_rmse,
    camera_centers,
)

size, n, W, B = 256, 18, 6, 128
focal = float(size)
cfg = sift_config(size)
K = jnp.array(
    [[focal, 0, size / 2], [0, focal, size / 2], [0, 0, 1.0]], jnp.float32
)
ks = [i if i <= n // 2 else n - 1 - i for i in range(n)]
gt_rvecs = np.stack([[0.0, 0.025 * k, 0.002 * k] for k in ks]).astype(np.float32)
gt_tvecs = np.stack([[-0.25 * k, 0.012 * k, 0.035 * k] for k in ks]).astype(np.float32)
fe = jax.jit(lambda x: extract_features(x, cfg, 256, dual_orientation=True))
feats = [
    fe(jnp.asarray(native.render_frame(size, gt_rvecs[i], gt_tvecs[i],
                                       focal, seed=3)))
    for i in range(n)
]
gt = camera_centers(jnp.asarray(gt_rvecs), jnp.asarray(gt_tvecs))
span = float(np.linalg.norm(np.ptp(np.asarray(gt), axis=0)))
key = jax.random.key(1)

# --- manual round-4 style per-frame driver (marginalize on, no loops) --
m = empty_map(W, B, max_loops=0)
keys = [jax.random.fold_in(key, i) for i in range(n)]
init_fn = jax.jit(functools.partial(init_two_view, pts_per_frame=B))
reg_fn = jax.jit(functools.partial(register_frame, pts_per_frame=B))
shift_fn = jax.jit(functools.partial(shift_window, pts_per_frame=B))
solver = resolve_solver(W, W * B, "auto")
ba_fn = jax.jit(functools.partial(
    bundle_adjust, n_iters=8, damping=1e-4, huber_delta=2.0, solver=solver,
))
harvest_fn = jax.jit(functools.partial(
    harvest_anchors, pts_per_frame=B, per_eviction=B))
anc = empty_anchors((W - 1) * B)
frozen_r, frozen_t = [], []
m, used = init_fn(keys[0], feats[0], feats[1], K, m)
for i in range(2, n):
    if i >= W:
        frozen_r.append(m.rvecs[0])
        frozen_t.append(m.tvecs[0])
        anc = harvest_fn(m, anc)
        m = shift_fn(m)
    slot = min(i, W - 1)
    m, used = reg_fn(
        keys[i], m, feats[i], feats[i - 1],
        jnp.asarray(slot, jnp.int32), K, used,
    )
    if i % 2 == 0 or i == n - 1:
        st = ba_fn(m.ba_state(), m.obs, K, anchors=anc)
        m = m._replace(rvecs=st.rvecs, tvecs=st.tvecs, points=st.points)
rv = jnp.stack(frozen_r + [m.rvecs[s] for s in range(W)])
tv = jnp.stack(frozen_t + [m.tvecs[s] for s in range(W)])
ate_manual = float(ate_rmse(camera_centers(rv, tv), gt))
print(f"manual per-frame driver: ATE {ate_manual:.4f} "
      f"({100*ate_manual/span:.2f}% of span)", flush=True)

# --- round-5 fused-scan driver -----------------------------------------
traj, m2 = run_odometry(key, feats, K, window=W, loop_closure=False,
                        marginalize=True)
ate_scan = float(ate_rmse(camera_centers(traj.rvecs, traj.tvecs), gt))
print(f"fused-scan driver:       ATE {ate_scan:.4f} "
      f"({100*ate_scan/span:.2f}% of span)")
