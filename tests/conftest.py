"""Test harness config: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh (the driver
separately dry-runs the multi-chip path; real-TPU numbers come from bench.py).
Must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# the axon TPU plugin overrides JAX_PLATFORMS; JAX_PLATFORM_NAME wins
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def rgb_image(rng):
    """Odd-sized random RGB uint8 image (stresses center conventions)."""
    return rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)


@pytest.fixture
def rgb_batch(rng):
    return rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
