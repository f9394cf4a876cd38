"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding tests use XLA's
host-platform device forcing (SURVEY.md §5 'multi-node without a cluster'
analogue — the reference likewise tests multi-GPU as N processes on one
machine).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# jax may already be imported by a pytest plugin (env vars above are then
# read too late for config, but the backend is not yet initialized — the
# config update below still takes effect).
import jax

jax.config.update("jax_platforms", "cpu")
# NOTE: the persistent compile cache was tried here to cut suite wall-clock
# (XLA:CPU compiles dominate) but XLA's cpu_aot_loader logs a noisy
# feature-mismatch ERROR for every cache load on this machine; left off.

import pathlib

import pytest

REFERENCE_TESTS = pathlib.Path("/root/reference/hydra_app/tests")


@pytest.fixture(scope="session")
def test42_dir():
    d = REFERENCE_TESTS / "test_42"
    if not d.exists():
        pytest.skip("reference test scenes unavailable")
    return str(d)


@pytest.fixture(scope="session")
def test42_scene(test42_dir):
    from hydracore_tpu.scene.scene import load_scene

    return load_scene(test42_dir, width=64, height=64)
