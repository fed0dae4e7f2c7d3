"""Checkpointing: orbax-backed save/restore + torch checkpoint ingestion.

Replaces Lightning ``ModelCheckpoint`` (reference:
exp/train_diffusion_gh.yaml:50-58 — monitor valid_loss, save_top_k=1,
save_last) with an orbax ``CheckpointManager`` configured the same way, and
provides a converter that reads PyTorch/Lightning ``.ckpt``/``.pt`` files
(``state_dict`` of torch tensors) into flat numpy dicts so reference weights
can be imported into JAX parameter pytrees (reference load path:
main/generation.py:40-43).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Callable, Mapping, Optional

import numpy as np

import orbax.checkpoint as ocp


@dataclasses.dataclass
class CheckpointConfig:
    directory: str | Path
    monitor: str = "valid_loss"
    mode: str = "min"  # "min" or "max"
    save_top_k: int = 1
    save_last: bool = True
    keep_every_n_steps: Optional[int] = None


class Checkpointer:
    """Save/restore train state pytrees; keeps best-k by a monitored metric."""

    def __init__(self, config: CheckpointConfig):
        self.config = config
        directory = Path(config.directory).absolute()
        directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=config.save_top_k + (1 if config.save_last else 0),
            best_fn=(lambda m: m[config.monitor]) if config.save_top_k else None,
            best_mode=config.mode,
            keep_period=config.keep_every_n_steps,
            create=True,
            # Synchronous commits: the async background thread raced with
            # donated device buffers over the TPU tunnel (observed: composite
            # finalize FileNotFoundError on the metrics item mid-training,
            # leaving only a *.orbax-checkpoint-tmp dir).  Saves happen once
            # per val interval, so blocking a few seconds is cheap.
            enable_async_checkpointing=False,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: Any, metrics: Optional[Mapping[str, float]] = None):
        import jax

        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        # Materialize on host first: trainers jit with donate_argnums=(0,), so
        # the caller's next step invalidates these buffers; device_get is also
        # the only reliable D2H sync over the tunnel (see CLAUDE.md timing note).
        state = jax.device_get(state)
        self._mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics or None)

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.config.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


# --------------------------------------------------------------------------
# Torch checkpoint ingestion
# --------------------------------------------------------------------------

def load_torch_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    """Read a torch ``.ckpt``/``.pt`` file into ``{name: np.ndarray}``.

    Handles both raw ``state_dict`` files and Lightning checkpoints (which
    nest it under ``"state_dict"``).  Torch is only imported here — the rest
    of the framework never touches it.
    """
    import torch  # local import: torch is a conversion-time-only dependency

    blob = torch.load(str(path), map_location="cpu", weights_only=False)
    if isinstance(blob, Mapping) and "state_dict" in blob:
        blob = blob["state_dict"]
    out = {}
    for k, v in blob.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def convert_with_map(
    torch_params: Mapping[str, np.ndarray],
    mapping: Mapping[str, tuple[str, Optional[Callable[[np.ndarray], np.ndarray]]]],
) -> dict[str, np.ndarray]:
    """Apply a ``jax_path -> (torch_key, transform)`` mapping table.

    Transforms handle layout differences, e.g. torch Conv1d ``(O, I, K)`` →
    flax ``(K, I, O)`` kernels, Linear ``(O, I)`` → ``(I, O)``.
    """
    out: dict[str, np.ndarray] = {}
    for jax_path, (torch_key, transform) in mapping.items():
        arr = np.asarray(torch_params[torch_key])
        out[jax_path] = transform(arr) if transform else arr
    return out


# Common layout transforms
def t_linear(w: np.ndarray) -> np.ndarray:  # (O, I) -> (I, O)
    return w.T


def t_conv1d(w: np.ndarray) -> np.ndarray:  # (O, I, K) -> (K, I, O)
    return np.transpose(w, (2, 1, 0))


def t_conv2d(w: np.ndarray) -> np.ndarray:  # (O, I, Kh, Kw) -> (Kh, Kw, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def t_conv3d(w: np.ndarray) -> np.ndarray:  # (O, I, Kt, Kh, Kw) -> (Kt, Kh, Kw, I, O)
    return np.transpose(w, (2, 3, 4, 1, 0))


def unflatten(flat: Mapping[str, np.ndarray], sep: str = ".") -> dict:
    """Turn ``{"a.b.c": x}`` into nested dicts — a flax params pytree."""
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split(sep)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def flatten(tree: Any, prefix: str = "", sep: str = ".") -> dict[str, Any]:
    out: dict[str, Any] = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(flatten(v, f"{prefix}{sep}{k}" if prefix else str(k), sep))
    else:
        out[prefix] = tree
    return out
