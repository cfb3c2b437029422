"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip sharding paths are validated on a virtual CPU mesh
(xla_force_host_platform_device_count), per the build plan in SURVEY.md §4.

Note: this image's sitecustomize registers the `axon` TPU PJRT plugin at
interpreter start and pins jax_platforms to it; overriding via
``jax.config.update("jax_platforms", "cpu")`` before first backend use wins.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
