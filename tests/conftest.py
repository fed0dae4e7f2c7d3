"""Test harness config: force an 8-device CPU mesh before JAX initializes.

This lets every pjit/sharding test exercise real multi-device code paths
without TPU hardware (SURVEY §4 'mesh-on-CPU harness').
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the outer env pins a TPU platform

# A sitecustomize pre-imports jax with the TPU platform before this file
# runs; no backend exists yet, so re-pointing the config still works
# (shared trick: syncfusion_tpu/core/platform.py).
from syncfusion_tpu.core.platform import force_platform  # noqa: E402

force_platform("cpu", n_virtual_devices=8)

import jax  # noqa: E402

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


def _host_cpu_flags():
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return set(line.split(":", 1)[1].split())
    except OSError:
        pass
    return None


if os.path.exists(_seed_tar) and not os.path.exists(
    os.path.join(_cache_dir, ".seeded")
):
    # Only seed when this host supports every CPU feature the cache was
    # compiled with — XLA's persistent-cache key does NOT fully encode the
    # target ISA, and loading AOT blobs compiled for a wider feature set
    # can SIGILL (the loader itself warns about exactly this).
    _flags_file = _seed_tar.replace(".tar.gz", ".cpuflags")
    _want = set(open(_flags_file).read().split()) if os.path.exists(_flags_file) else None
    _have = _host_cpu_flags()
    if _want is not None and _have is not None and _want <= _have:
        import subprocess

        os.makedirs(_cache_dir, exist_ok=True)
        subprocess.run(["tar", "-zxf", _seed_tar, "-C", _cache_dir], check=False)
    os.makedirs(_cache_dir, exist_ok=True)
    open(os.path.join(_cache_dir, ".seeded"), "w").close()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
