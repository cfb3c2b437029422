"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip sharding paths are validated on a virtual CPU mesh
(xla_force_host_platform_device_count), per the build plan in SURVEY.md §4.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
