"""Guard the driver entry points in ``__graft_entry__``.

The round driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(N)`` on a virtual CPU mesh — but only at round end,
when a breakage can no longer be fixed.  These tests run the exact same
contract inside the suite so a mid-round refactor that breaks either
path fails fast.  (conftest.py already forces the 8-device CPU mesh.)
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_returns_features():
    fn, args = graft.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    out = jax.block_until_ready(compiled(*args))
    # Flagship forward = full SIFT frontend: must expose descriptors for
    # max_keypoints=512 slots (the driver only compile-checks; we also run).
    leaves = jax.tree_util.tree_leaves(out)
    assert leaves, "entry() forward returned an empty pytree"
    assert any(
        x.ndim >= 2 and 512 in x.shape for x in leaves
    ), "no per-keypoint output with the requested 512 slots"


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    assert len(jax.devices()) >= 8
    graft.dryrun_multichip(8)
