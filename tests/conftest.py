"""Test harness: force JAX onto 8 virtual CPU devices so sharding /
collective paths are exercised without TPU hardware (SURVEY.md §4
multi-host-without-a-cluster strategy)."""
import os
import sys

# Force CPU even when the environment points JAX at real TPU hardware:
# the axon sitecustomize registers the TPU backend at interpreter start,
# so the env var alone is not enough — override via jax.config too.
# The test suite must exercise sharding on 8 virtual devices
# deterministically.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devices = jax.devices()
    assert len(devices) >= 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices
