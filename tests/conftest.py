"""Test configuration: force an 8-virtual-device CPU mesh.

Tests run on CPU with 8 fake devices so sharding/collective logic is
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path). Must run before jax initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np
import pytest


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)
