"""Test configuration.

Mirrors the reference's testing strategy (SURVEY.md §4): tests run on a CPU
backend with a virtual 8-device mesh so multi-chip sharding is exercised
without TPU hardware (the analog of TVM's in-process RPC servers for
distributed-without-a-cluster testing, `tests/python/unittest/test_runtime_rpc.py`).
"""

import os

# Must be set before jax import anywhere in the test process.  The harness
# environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests must run on
# local CPU with 8 virtual devices, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon PJRT plugin can override the env var; pin via config too.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")
    config.addinivalue_line("markers", "slow: long-running test")


def has_tpu() -> bool:
    # the test session pins JAX_PLATFORMS=cpu; real-TPU tests are opt-in
    # via TK_TEST_TPU=1 (the reference's requires_gpu-style capability gate,
    # `python/tvm/testing/utils.py:1072`)
    return os.environ.get("TK_TEST_TPU") == "1"


requires_tpu = pytest.mark.skipif(not has_tpu(), reason="needs real TPU (set TK_TEST_TPU=1)")
