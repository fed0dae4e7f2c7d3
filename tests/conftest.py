"""Test harness config: force an 8-device CPU mesh before JAX initializes.

This lets every pjit/sharding test exercise real multi-device code paths
without TPU hardware (SURVEY §4 'mesh-on-CPU harness').
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the outer env pins a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A sitecustomize pre-imports jax with the TPU platform before this file
# runs; no backend exists yet, so re-pointing the config still works.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Suite wall time is dominated by XLA CPU compiles of per-test model
# variants; the persistent cache makes re-runs of an unchanged suite fast.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
