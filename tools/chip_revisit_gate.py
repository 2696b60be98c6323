"""18-frame out-and-back revisit gate ON THE REAL CHIP.

The CPU pytest suite runs this gate in f32; TPU's bf16 matmul default
(and any new solver algebra) can only be validated here. Mirrors
tests/test_odometry.py::TestWindowedLoopClosure exactly.
"""
import os
import sys

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

size, n, window = 256, 18, 6
focal = float(size)
cfg = sift_config(size)
K = jnp.array(
    [[focal, 0, size / 2], [0, focal, size / 2], [0, 0, 1.0]], jnp.float32
)
ks = [i if i <= n // 2 else n - 1 - i for i in range(n)]
gt_rvecs = np.stack([[0.0, 0.025 * k, 0.002 * k] for k in ks]).astype(
    np.float32
)
gt_tvecs = np.stack([[-0.25 * k, 0.012 * k, 0.035 * k] for k in ks]).astype(
    np.float32
)
fe = jax.jit(lambda x: extract_features(x, cfg, 256, dual_orientation=True))
feats = [
    fe(jnp.asarray(native.render_frame(size, gt_rvecs[i], gt_tvecs[i],
                                       focal, seed=3)))
    for i in range(n)
]
gt = camera_centers(jnp.asarray(gt_rvecs), jnp.asarray(gt_tvecs))
span = float(np.linalg.norm(np.ptp(np.asarray(gt), axis=0)))

ates = {}
for marg, lc in ((True, False), (True, True), (False, False), (False, True)):
    traj, m = run_odometry(
        jax.random.key(1), feats, K, window=window,
        loop_closure=lc, marginalize=marg,
    )
    est = camera_centers(traj.rvecs, traj.tvecs)
    ates[(marg, lc)] = float(ate_rmse(est, gt))
    print(f"marginalize={marg} loop_closure={lc}: "
          f"ATE {ates[(marg, lc)]:.4f} ({100*ates[(marg, lc)]/span:.2f}% "
          f"of span)", flush=True)

ok = True


def check(name, cond):
    global ok
    print(f"{'PASS' if cond else 'FAIL'}  {name}")
    ok = ok and cond


check("anchored windowed-only < 5% span", ates[(True, False)] < 0.05 * span)
check("anchored loop-closed < 5% span", ates[(True, True)] < 0.05 * span)
check("loop closure no degradation (<=1.1x)",
      ates[(True, True)] <= ates[(True, False)] * 1.1)
check("ablations hold the 5% bar too",
      ates[(False, False)] < 0.05 * span
      and ates[(False, True)] < 0.05 * span)
check("anchors never hurt",
      ates[(True, False)] <= ates[(False, False)] * 1.1)
# The >= 1.8x RELATIVE benefit of anchors/loops is a LENGTH claim —
# gated at 120/500 frames (tests/test_long_sequence.py). At 18 frames
# on chip the round-5 solver work improved the ablation itself
# (3.79% -> 1.50% of span), shrinking the short-sequence margin; the
# factors are printed above for the record, not asserted here.
print(f"info: anchors factor {ates[(False, False)]/ates[(True, False)]:.2f}x, "
      f"loop factor on ablation "
      f"{ates[(False, False)]/ates[(False, True)]:.2f}x")
sys.exit(0 if ok else 1)
