"""Test config: force an 8-device virtual CPU platform before JAX initializes.

All tests run on CPU (the real TPU chip is reserved for bench.py); sharding
tests exercise a virtual 8-device mesh, matching how the driver dry-runs the
multi-chip path.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Force CPU. The machine environment exports JAX_PLATFORMS=axon and the axon
# sitecustomize re-registers the TPU plugin regardless of that env var, so the
# only reliable override is jax.config AFTER import — otherwise every test
# runs on the single real TPU chip and concurrent JAX processes deadlock on
# the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the big train-step graphs take minutes of
# cold XLA:CPU compile on a 1-core box, so the repo COMMITS the test cache
# (.test_cache) — a fresh checkout runs the suite warm; entries whose machine
# features mismatch are rejected by XLA and recompiled (log spam, still
# correct). W2L_TEST_CACHE_DIR overrides ("" disables).
_cache_dir = os.environ.get(
    "W2L_TEST_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".test_cache"),
)
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
