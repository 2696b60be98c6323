"""500-frame endurance ON THE REAL CHIP (hardware evidence for the
CPU-mesh gate tests/test_long_sequence.py::test_500_frame_endurance).

Renders 12.5 revisit cycles, extracts features on chip, runs the batch
odometry driver (fused steady-state scan) at DEFAULT knobs + coverage
policy, and reports ATE / loops / wall segments.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sift_parallel_optimization_tpu.models.frontend import (
    extract_features,
    sift_config,
)
from sift_parallel_optimization_tpu.models.odometry import run_odometry
from sift_parallel_optimization_tpu.utils import native
from sift_parallel_optimization_tpu.utils.trajectory import (
    ate_rmse,
    camera_centers,
)

n, period, window, size = 500, 40, 6, 256
focal = float(size)
cfg = sift_config(size)
K = jnp.array(
    [[focal, 0, size / 2], [0, focal, size / 2], [0, 0, 1.0]], jnp.float32
)
half = period // 2
ks = [
    (i % period) if (i % period) <= half else period - (i % period)
    for i in range(n)
]
gt_rvecs = np.stack([[0.0, 0.025 * k, 0.002 * k] for k in ks]).astype(
    np.float32
)
gt_tvecs = np.stack([[-0.25 * k, 0.012 * k, 0.035 * k] for k in ks]).astype(
    np.float32
)
fe = jax.jit(lambda x: extract_features(x, cfg, 256, dual_orientation=True))

t0 = time.perf_counter()
feats = [
    fe(jnp.asarray(native.render_frame(
        size, gt_rvecs[i], gt_tvecs[i], focal, seed=3)))
    for i in range(n)
]
jax.block_until_ready(feats[-1].descriptors)
t_fe = time.perf_counter() - t0

t1 = time.perf_counter()
traj, m, info = run_odometry(
    jax.random.key(1), feats, K, window=window, loop_closure=True,
    archive_policy="coverage", return_info=True,
)
# Force full materialization (relay async).
_ = np.asarray(traj.tvecs)
t_odo = time.perf_counter() - t1

gt = camera_centers(jnp.asarray(gt_rvecs), jnp.asarray(gt_tvecs))
span = float(np.linalg.norm(np.ptp(np.asarray(gt), axis=0)))
ate = float(ate_rmse(camera_centers(traj.rvecs, traj.tvecs), gt))
print(f"frontend+render: {t_fe:.1f}s for {n} frames "
      f"({1e3 * t_fe / n:.1f} ms/frame wall incl. relay)")
print(f"odometry (scan + PGO + compile): {t_odo:.1f}s wall")
print(f"loops accepted: {len(info['loop_frames'])}, "
      f"dropped: {info['loops_dropped']}")
print(f"ATE: {ate:.4f} ({100 * ate / span:.2f}% of span {span:.2f})")
print(f"map capacities: {m.rvecs.shape[0]} cams, "
      f"{m.points.shape[0]} pts (O(window))")
ok = (
    ate < 0.05 * span and info["loops_dropped"] == 0
    and m.rvecs.shape[0] == window
)
print("PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
