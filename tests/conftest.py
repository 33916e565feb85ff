"""Test config: run everything on CPU with 8 virtual devices so sharding
tests work without TPU hardware (SURVEY.md §4 test strategy).

Note: this environment force-sets JAX_PLATFORMS=axon (tunneled TPU) via a
site hook, so the env var alone doesn't stick — we must also update
jax.config before any backend is initialized. Running tests on the tunnel
would make every eager dispatch a network round-trip.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def reference_data():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference data not available")
    return REFERENCE_DATA
