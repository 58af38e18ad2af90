"""Test harness: force an 8-virtual-device CPU platform BEFORE jax import.

Multi-chip sharding is tested on a fake host-platform mesh (the driver
separately dry-runs the multi-chip path); physics/unit tests run on CPU so
the suite is hermetic and fast.
"""

import os

# NOTE: must OVERRIDE, not setdefault — the container pins JAX_PLATFORMS
# to the TPU platform (and its site hook re-pins it via jax.config at
# interpreter start), and tests must not contend for the single real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    f"tests must run on CPU, got {jax.devices()[0]}"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
