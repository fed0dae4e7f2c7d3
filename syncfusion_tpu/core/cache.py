"""Persistent XLA compile cache for the CLI drivers.

Compiles of the full-size graphs over this environment's TPU tunnel are
slow (full UNet forward ~200 s first time); the persistent cache makes
every driver after the first — and every resume — start in seconds.
bench.py and perf_sweep.py already do this; the drivers share it here.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compile_cache(path: str | os.PathLike | None = None) -> None:
    """Idempotently point JAX's compilation cache at ``<repo>/.jax_cache``
    (gitignored) or ``path``.  Must run before the first compilation; safe
    to call from every driver.

    Also honors ``SYNCFUSION_PLATFORM=cpu`` (see core/platform.py): lets
    any CLI be driven on CPU while the exclusive TPU tunnel is busy (CI,
    verification, parallel dev), with the CPU-ahead compile cache."""
    import jax

    from syncfusion_tpu.core.platform import honor_platform_request

    platform = honor_platform_request()
    if platform == "cpu" and path is None:
        cpu_cache = Path(__file__).resolve().parents[2] / ".jax_cache_cpu"
        if cpu_cache.is_dir():
            path = cpu_cache
    if path is None:
        path = Path(__file__).resolve().parents[2] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
