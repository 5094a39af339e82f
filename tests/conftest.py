"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (the driver's dryrun does the
same).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# site config may pin jax_platforms (e.g. "axon,cpu") which overrides the
# env var — force the CPU backend explicitly for tests
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
