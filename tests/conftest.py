"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on CPU with XLA's forced host device count (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).

NOTE: this environment loads an `axon` sitecustomize that registers a TPU
backend in every Python process and forces JAX_PLATFORMS=axon, so env vars
set here are too late for jax's import-time config read — we must override
via jax.config.update() AND set XLA_FLAGS before the first backend
initialization (which has not happened yet at conftest import time).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
