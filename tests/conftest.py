"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count); the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment's sitecustomize force-registers the 'axon' TPU-tunnel
# platform in every process; override it so tests run on a local 8-device
# virtual CPU mesh (fast, deterministic, multi-chip shardings compile).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def test_db():
    """Path to the reference-bundled small fixture files."""
    path = "/root/reference/gatb-core/test/db"
    if not os.path.isdir(path):
        pytest.skip("reference test/db not available")
    return path
