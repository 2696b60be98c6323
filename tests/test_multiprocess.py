"""Multi-host simulation: distributed BA across 2 OS processes.

SURVEY.md section 4's test-strategy item (3): multi-host behavior without
a cluster, via `jax.distributed` on the CPU backend. Two processes with 4
virtual devices each form one global 8-device mesh; observations shard
across ALL 8 (so psum crosses the process boundary); both processes must
converge to the single-process result.
"""

import json
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys, json
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=pid,
    )
    import jax.numpy as jnp, numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from sift_parallel_optimization_tpu.models.ba import (
        BAState, Observations, rms_error,
    )
    from sift_parallel_optimization_tpu.models.geometry import project
    from sift_parallel_optimization_tpu.parallel.ba import (
        distributed_bundle_adjust, pad_observations,
    )

    K = jnp.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]])
    rng = np.random.default_rng(0)
    n_cams, n_pts = 4, 32
    pts = jnp.asarray(rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32))
    pts = pts.at[:, 2].add(5.0)
    rvecs = jnp.asarray(
        [[0.0, 0.08 * i, 0.0] for i in range(n_cams)], dtype=jnp.float32
    )
    tvecs = jnp.asarray(
        [[0.4 * i, 0.0, 0.0] for i in range(n_cams)], dtype=jnp.float32
    )
    uv = jnp.concatenate(
        [project(pts, rvecs[i], tvecs[i], K)[0] for i in range(n_cams)]
    )
    obs = Observations(
        cam_idx=jnp.repeat(jnp.arange(n_cams), n_pts),
        pt_idx=jnp.tile(jnp.arange(n_pts), n_cams),
        uv=uv, valid=jnp.ones(n_cams * n_pts, bool),
    )
    noisy = BAState(
        rvecs=rvecs + 0.01, tvecs=tvecs + 0.03, points=pts + 0.05
    )
    mesh = Mesh(np.asarray(jax.devices()).reshape(8, 1), ("data", "spatial"))
    # Shard observations over the GLOBAL data axis (crosses processes).
    obs_p = pad_observations(obs, 8)
    gspec = NamedSharding(mesh, P("data"))
    gspec2 = NamedSharding(mesh, P("data", None))
    rep = NamedSharding(mesh, P())
    obs_g = Observations(
        cam_idx=jax.make_array_from_process_local_data(gspec, np.asarray(obs_p.cam_idx)),
        pt_idx=jax.make_array_from_process_local_data(gspec, np.asarray(obs_p.pt_idx)),
        uv=jax.make_array_from_process_local_data(gspec2, np.asarray(obs_p.uv)),
        valid=jax.make_array_from_process_local_data(gspec, np.asarray(obs_p.valid)),
    )
    out = jax.jit(
        lambda s, o: distributed_bundle_adjust(s, o, K, mesh, n_iters=6,
                                               damping=1e-4)
    )(noisy, obs_g)
    err = float(rms_error(
        BAState(*[jnp.asarray(np.asarray(x)) for x in out]), obs, K
    ))
    print("RESULT " + json.dumps({"pid": pid, "rms": err}), flush=True)
    """
)


@pytest.mark.slow
def test_two_process_distributed_ba(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=".",
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                rec = json.loads(line[7:])
                results[rec["pid"]] = rec["rms"]
    assert sorted(results) == [0, 1]
    # Both processes hold the same replicated result, converged.
    assert abs(results[0] - results[1]) < 1e-6
    assert results[0] < 0.05, f"distributed BA did not converge: {results}"
