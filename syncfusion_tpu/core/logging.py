"""Metrics / observability.

The reference logs everything to wandb (SURVEY §5).  wandb is optional here:
``MetricLogger`` always writes JSONL to the run dir (greppable, test-able),
and forwards to wandb when the package + credentials exist.  Audio/media
artifacts are written as files next to the metrics.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from pathlib import Path
from typing import Any, Mapping, Optional

import numpy as np


def get_logger(name: str = "syncfusion_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("[%(asctime)s %(levelname)s %(name)s] %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("SYNCFUSION_LOGLEVEL", "INFO"))
    # Only process 0 prints in multi-host runs (rank_zero semantics of
    # reference main/utils.py:31-49).  Read the distributed runtime state
    # directly instead of jax.process_index(): the latter force-initializes
    # the backend, which costs ~19 s of TPU tunnel setup for CLIs that never
    # touch the device.  Multi-host runs must call jax.distributed.initialize
    # first, which populates this state; otherwise the process is rank 0.
    try:
        from jax._src import distributed
    except ImportError:
        # Private module moved in a jax upgrade: fall back to the public
        # API (which may force backend init) rather than silently losing
        # rank gating — duplicated multi-host logs would be invisible
        # otherwise.
        import jax

        if jax.process_count() > 1 and jax.process_index() != 0:
            logger.setLevel(logging.ERROR)
        return logger
    if (getattr(distributed.global_state, "process_id", 0) or 0) != 0:
        logger.setLevel(logging.ERROR)
    return logger


class MetricLogger:
    """JSONL metrics writer with optional wandb mirroring."""

    def __init__(self, run_dir: str | Path, use_wandb: bool = False, **wandb_kwargs):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.run_dir / "metrics.jsonl", "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(dir=str(self.run_dir), **wandb_kwargs)
            except Exception as e:  # wandb missing or offline
                get_logger().warning("wandb unavailable (%s); JSONL only", e)

    def log(self, metrics: Mapping[str, Any], step: Optional[int] = None) -> None:
        record = {"_time": time.time()}
        if step is not None:
            record["step"] = int(step)
        for k, v in metrics.items():
            if hasattr(v, "item"):
                v = v.item()
            record[k] = v
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)

    def log_audio(self, name: str, wav: np.ndarray, sample_rate: int, step: int = 0):
        """Write a waveform artifact (and mirror to wandb if present)."""
        from syncfusion_tpu.ops.wav import write_wav

        media = self.run_dir / "media"
        media.mkdir(exist_ok=True)
        path = media / f"{name}_step{step}.wav"
        write_wav(path, np.asarray(wav), sample_rate)
        if self._wandb is not None:
            try:
                import wandb  # type: ignore

                self._wandb.log({name: wandb.Audio(str(path))}, step=step)
            except Exception:
                pass
        return path

    def close(self) -> None:
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
