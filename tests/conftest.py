"""Test configuration: force JAX onto 8 virtual CPU devices.

Must run before any jax import (pytest imports conftest first). This lets
multi-chip sharding logic (mesh, pjit, collectives) be exercised without TPU
hardware, per the framework's test strategy (SURVEY.md §4).
"""

import os

# Force CPU: tests never touch the TPU tunnel. PALLAS_AXON_POOL_IPS must be
# cleared too — the axon sitecustomize registers a remote PJRT plugin in every
# python process when it is set, and backend init then blocks on the tunnel.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# A pytest plugin may have imported jax before this conftest ran, baking in
# the environment's JAX_PLATFORMS=axon. Override through the config API too
# (safe as long as no backend has been initialized yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the GAN train-step graph takes minutes to
# compile on CPU; cache it across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
