"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes, so this executes at conftest import time.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu") at
# interpreter start, which outranks the env var — force CPU back via config.
jax.config.update("jax_platforms", "cpu")

# Full-precision matmuls so golden-value parity tests are meaningful.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest

REFERENCE_PATH = "/root/reference"


# ---------------------------------------------------------------------------
# Test tiers: the default `pytest -q` run skips tests marked `slow` (the
# multi-minute e2e / multi-process / statistical-training tests) so the inner
# loop stays fast.  The FULL tier — what CI / the round-end verification must
# run — is `pytest -q --run-slow` (or VP3D_RUN_SLOW=1).
# ---------------------------------------------------------------------------


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow", action="store_true", default=False,
        help="also run tests marked slow (full tier)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute test (e2e sweep / multi-process cluster / "
        "statistical training); skipped unless --run-slow or VP3D_RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    run_slow_env = os.environ.get("VP3D_RUN_SLOW", "")
    if config.getoption("--run-slow") or run_slow_env.lower() not in (
            "", "0", "false", "no"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: pass --run-slow (or VP3D_RUN_SLOW=1) to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_PATH)


@pytest.fixture
def reference_modules():
    """Import the upstream reference implementation (read-only) for golden-value
    parity tests.  Skips if unavailable."""
    if not reference_available():
        pytest.skip("reference implementation not available")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import common.camera as ref_camera
    import common.loss as ref_loss
    import common.model as ref_model
    import common.quaternion as ref_quaternion
    import common.skeleton as ref_skeleton
    import common.generators as ref_generators

    class Ref:
        camera = ref_camera
        loss = ref_loss
        model = ref_model
        quaternion = ref_quaternion
        skeleton = ref_skeleton
        generators = ref_generators

    return Ref


def fresh_reference_h36m_dataset(path):
    """Construct the reference Human36mDataset from a fresh module copy.

    The reference keeps its skeleton as a module-level singleton that
    ``remove_static_joints`` mutates destructively, so constructing the dataset
    twice in one process fails (reference quirk).  Reloading the module gives
    each construction a pristine skeleton."""
    import importlib
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import common.h36m_dataset as m
    importlib.reload(m)
    return m.Human36mDataset(path)
