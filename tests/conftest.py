"""Test harness: force an 8-device virtual CPU platform.

Multi-chip sharding is validated without TPU hardware via
``--xla_force_host_platform_device_count=8`` (the TPU-native analog of a fake
backend; SURVEY.md §4). Must run before the first jax import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU sitecustomize force-sets jax_platforms="axon,cpu"; tests always
# run on the virtual 8-device CPU platform regardless.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
