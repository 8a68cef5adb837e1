"""Test config: force an 8-device virtual CPU platform before JAX initializes.

All tests run on CPU (the real TPU chip is reserved for bench.py); sharding
tests exercise a virtual 8-device mesh, matching how the driver dry-runs the
multi-chip path.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
