"""Test configuration.

Mirrors the reference's testing strategy (SURVEY.md §4): tests run on a CPU
backend with a virtual 8-device mesh so multi-chip sharding is exercised
without TPU hardware (the analog of TVM's in-process RPC servers for
distributed-without-a-cluster testing, `tests/python/unittest/test_runtime_rpc.py`).
"""

import os

# Must be set before jax import anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")
    config.addinivalue_line("markers", "slow: long-running test")
