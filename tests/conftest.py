"""Test configuration: force an 8-virtual-device CPU mesh.

Tests run on CPU with 8 fake devices so sharding/collective logic is
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path). Must run before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env may pre-set a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: repeated test runs skip recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax

# The env pins JAX_PLATFORMS to the TPU plugin in a way that survives
# os.environ edits; the config knob wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)
