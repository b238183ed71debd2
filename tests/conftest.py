"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count); the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def test_db():
    """Path to the reference-bundled small fixture files."""
    path = "/root/reference/gatb-core/test/db"
    if not os.path.isdir(path):
        pytest.skip("reference test/db not available")
    return path
