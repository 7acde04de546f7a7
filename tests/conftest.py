"""Test harness config: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh (the driver
separately dry-runs the multi-chip path; real-TPU numbers come from bench.py).

The axon TPU plugin snapshots the environment at interpreter startup, so
os.environ mutation here is too late — the process must *start* with the CPU
config. pytest_configure stops global capture (restoring the real stdout fds)
and re-execs pytest once with the forced environment.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

_REEXEC_FLAG = "_ITT_CPU_TEST_REEXEC"


def pytest_configure(config):
    if os.environ.get(_REEXEC_FLAG) == "1":
        return
    env = dict(os.environ)
    env[_REEXEC_FLAG] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    # drop the axon plugin trigger entirely: sitecustomize only registers
    # the TPU plugin when PALLAS_AXON_POOL_IPS is set, and a stalled
    # tunnel otherwise hangs plugin init even for CPU-backend test runs
    env.pop("PALLAS_AXON_POOL_IPS", None)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()  # restore the real stdout/stderr fds
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)


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
