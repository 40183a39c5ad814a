"""Test configuration: force CPU with 8 virtual devices.

Tests must be runnable without TPU hardware; sharding tests use an 8-device
virtual CPU mesh. Set before any jax import.
"""

import os

_platform = os.environ.get("NTIRE_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize imports jax at interpreter start and pins the
# platform config; env vars alone no longer take effect, so update the
# config directly (safe: no backend has been initialised yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True)
def _restore_numerics_mode():
    """config.set_mode is process-global; tools invoked in-process (e.g. the
    sweep smoke tests call sweep_zoo_sustained.main, which sets 'high')
    must not leak their mode into later tests."""
    from ntire2022_esr_tpu import config

    prev = config.mode()
    yield
    if config.mode() != prev:
        config.set_mode(prev)
