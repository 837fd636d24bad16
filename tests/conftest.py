"""Test configuration.

Tests run on CPU with 8 virtual devices so that mesh/sharding paths are
exercised hermetically (the driver validates real-TPU behavior
separately via __graft_entry__ and bench.py). Env vars must be set
before jax is imported anywhere.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the
# remote-TPU tunnel) and the axon plugin's register() hook overwrites
# jax_platforms at jax-import time, so plain env vars are NOT enough --
# we must update the config after importing jax. Tests must never
# contend for the single real chip (remote compiles through the tunnel
# are slow and concurrent claims can deadlock).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is dominated by XLA:CPU compiles
# of the same jitted pipelines; cache them across test runs.
try:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/visfd_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import pathlib

import numpy as np
import pytest

REFERENCE_TESTS = pathlib.Path("/root/reference/tests")


@pytest.fixture(scope="session")
def reference_fixture_dir():
    if not REFERENCE_TESTS.is_dir():
        pytest.skip("reference test fixtures not available")
    return REFERENCE_TESTS


@pytest.fixture()
def rng():
    return np.random.default_rng(12345)
