"""Distributed bundle adjustment over a device mesh.

The north-star distributed back end (BASELINE.json: "distributed BA via
Schur-complement reduction over ICI collectives"). Where the reference's
distribution story was MPI point-to-point rows streamed to one collector
rank that did all the reduction work (GaussDePyramid-MPI.h:265-335,
mpitest.cpp:35-113 — the Amdahl bottleneck SURVEY.md section 2 flags), BA
here distributes the DOMINANT cost (per-observation linearization + block
assembly) and reduces with one collective:

  * the observation list is sharded over the ``data`` mesh axis
    (measurement-graph data parallelism);
  * every device assembles NormalBlocks from its shard — `segment_sum`
    and scatter-adds are shard-local;
  * ONE `psum` over the NormalBlocks pytree produces the global normal
    equations on every device (sums over observations commute with
    assembly);
  * the reduced (6C, 6C) camera solve + landmark back-substitution run
    replicated — they are O(C^3 + P) which is negligible next to the
    O(M) assembly for real scenes, and replication keeps every device
    holding the full updated state for the next linearization without a
    gather.

Equivalence with the single-device path is exact up to float reduction
order (tested in tests/test_parallel_ba.py).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from sift_parallel_optimization_tpu.models.ba import (
    BAState,
    Observations,
    apply_deltas,
    assemble_normal_blocks,
    solve_schur,
)


def pad_observations(obs: Observations, multiple: int) -> Observations:
    """Pad the observation list so it divides the mesh axis (masked slots)."""
    m = obs.cam_idx.shape[0]
    target = ((m + multiple - 1) // multiple) * multiple
    pad = target - m
    if pad == 0:
        return obs
    return Observations(
        cam_idx=jnp.pad(obs.cam_idx, (0, pad)),
        pt_idx=jnp.pad(obs.pt_idx, (0, pad)),
        uv=jnp.pad(obs.uv, ((0, pad), (0, 0))),
        valid=jnp.pad(obs.valid, (0, pad)),
    )


def distributed_ba_step(
    mesh: Mesh,
    K: jax.Array,
    damping: float = 1e-3,
    huber_delta: float | None = None,
    fix_first_cam: bool = True,
    axis: str = "data",
):
    """Returns fn(state, obs) -> state: one sharded Gauss-Newton step.

    ``obs`` arrays must divide mesh.shape[axis] (use pad_observations).
    State is replicated; observations are sharded on ``axis``.
    """

    def step(state: BAState, obs: Observations) -> BAState:
        def local(st, ob):
            blocks = assemble_normal_blocks(
                st, ob, K,
                huber_delta=huber_delta, fix_first_cam=fix_first_cam,
            )
            # The one collective: global normal equations on every device.
            blocks = jax.tree.map(lambda x: lax.psum(x, axis), blocks)
            dc, dp = solve_schur(
                blocks, damping=damping, fix_first_cam=fix_first_cam
            )
            return apply_deltas(st, dc, dp)

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(
                jax.tree.map(lambda _: P(), state),
                jax.tree.map(lambda _: P(axis), obs),
            ),
            out_specs=jax.tree.map(lambda _: P(), state),
            check_vma=False,
        )(state, obs)

    return step


def distributed_bundle_adjust(
    state: BAState,
    obs: Observations,
    K: jax.Array,
    mesh: Mesh,
    n_iters: int = 10,
    damping: float = 1e-3,
    huber_delta: float | None = None,
    fix_first_cam: bool = True,
    axis: str = "data",
) -> BAState:
    """Sharded damped Gauss-Newton BA (jit this whole function)."""
    n_dev = mesh.shape[axis]
    obs = pad_observations(obs, n_dev)
    step = distributed_ba_step(
        mesh, K,
        damping=damping, huber_delta=huber_delta,
        fix_first_cam=fix_first_cam, axis=axis,
    )

    def body(_, st):
        return step(st, obs)

    return lax.fori_loop(0, n_iters, body, state)
