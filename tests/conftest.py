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
# Threshold 0: cache EVERY compile — the suite is thousands of sub-2 s
# compiles, so the default threshold left cold runs at ~82 min while warm
# in-process reruns took ~14; a fully populated cache (seedable from
# data/jax_cache_cpu_seed.tar.gz if present) closes that gap.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

_seed_tar = os.path.join(os.path.dirname(__file__), "..", "data",
                         "jax_cache_cpu_seed.tar.gz")
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
if os.path.exists(_seed_tar) and not os.path.exists(
    os.path.join(_cache_dir, ".seeded")
):
    import subprocess

    os.makedirs(_cache_dir, exist_ok=True)
    subprocess.run(["tar", "-zxf", _seed_tar, "-C", _cache_dir], check=False)
    open(os.path.join(_cache_dir, ".seeded"), "w").close()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
