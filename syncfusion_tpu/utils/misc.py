"""Run utilities.

Reference main/utils.py equivalents: flaky-service retry (``retry_if_error``,
utils.py:190-197), hyperparameter snapshot logging (utils.py:123-165), param
counting, global seeding.
"""

from __future__ import annotations

import functools
import json
import random
import time
from pathlib import Path
from typing import Any, Callable

import jax
import numpy as np

from syncfusion_tpu.core.logging import get_logger

log = get_logger(__name__)


def seed_everything(seed: int) -> jax.Array:
    """Seed python/numpy and return a JAX root key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def retry_if_error(fn: Callable | None = None, *, retries: int = 10,
                   delay: float = 1.0):
    """Retry a flaky callable (the reference retries wandb init 10×)."""

    def deco(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            last: Exception | None = None
            for attempt in range(retries):
                try:
                    return f(*args, **kwargs)
                except Exception as e:  # noqa: BLE001 — genuinely retrying
                    last = e
                    log.warning("attempt %d/%d failed: %s", attempt + 1, retries, e)
                    time.sleep(delay)
            raise last  # type: ignore[misc]

        return wrapper

    return deco(fn) if fn is not None else deco


def count_params(tree: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "shape"))


def log_hyperparameters(run_dir: str | Path, config: Any, params: Any = None) -> None:
    """Snapshot config + param counts + installed packages to the run dir
    (reference utils.py:123-165)."""
    import importlib.metadata as md

    out = {
        "config": config,
        "param_count": count_params(params) if params is not None else None,
        "packages": sorted(
            f"{d.metadata['Name']}=={d.version}" for d in md.distributions()
        ),
        "jax_devices": [str(d) for d in jax.devices()],
    }
    path = Path(run_dir) / "hparams.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=2, default=str))


def load_dotenv(path: str | Path = ".env", override: bool = True) -> dict:
    """Minimal ``.env`` loader (reference script/train_diffusion_model.py:15
    ``dotenv.load_dotenv(override=True)``; `.env.tmp` documents the expected
    keys — wandb creds and DIR_* paths consumed via ``${oc.env:}``).

    Supports comments, blank lines, ``export KEY=VALUE`` and single/double
    quoted values.  Returns the parsed mapping; silently no-ops when the
    file doesn't exist (same as python-dotenv).
    """
    import os

    path = Path(path)
    parsed: dict[str, str] = {}
    if not path.exists():
        return parsed
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        if line.startswith("export "):
            line = line[len("export "):]
        key, _, value = line.partition("=")
        key, value = key.strip(), value.strip()
        if len(value) >= 2 and value[0] == value[-1] and value[0] in "'\"":
            value = value[1:-1]
        parsed[key] = value
        if override or key not in os.environ:
            os.environ[key] = value
    return parsed
