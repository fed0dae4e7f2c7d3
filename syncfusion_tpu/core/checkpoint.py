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
    """Save/restore train state pytrees; keeps best-k by a monitored metric.

    Saves are asynchronous by design: trainers jit with
    ``donate_argnums=(0,)``, so the caller's next step invalidates the state
    buffers — ``save`` therefore takes an ON-DEVICE snapshot first (one
    jitted copy, microseconds of device time) and hands it to a background
    worker that drains it to host and commits the orbax checkpoint.  Over
    the TPU tunnel the D2H drain of a ~2.5 GB Adam state takes minutes
    (latency- then bandwidth-bound); doing it on the training thread
    (observed: 13 min serial, ~5 min pipelined) would dwarf the training
    interval itself.  At most one save is in flight — a second ``save``
    first joins the previous one, bounding extra HBM to one state copy.
    """

    def __init__(self, config: CheckpointConfig):
        self.config = config
        directory = Path(config.directory).absolute()
        directory.mkdir(parents=True, exist_ok=True)
        # Lightning retention semantics (exp/train_diffusion_gh.yaml:50-58):
        # keep the best-k BY METRIC *and always the latest* (save_last).
        # orbax's max_to_keep+best_fn alone prunes purely by metric — seen
        # live: a 15-epoch onset run ended with its FINAL checkpoint
        # deleted because two earlier ones had better val loss.
        from orbax.checkpoint.checkpoint_managers import preservation_policy as _pp

        policies = []
        if config.save_top_k:
            policies.append(_pp.BestN(
                get_metric_fn=lambda m, _mon=config.monitor: m[_mon],
                reverse=(config.mode == "min"),
                n=config.save_top_k,
            ))
        if config.save_last:
            policies.append(_pp.LatestN(n=1))
        if config.keep_every_n_steps:
            policies.append(_pp.EveryNSteps(config.keep_every_n_steps))
        options = ocp.CheckpointManagerOptions(
            preservation_policy=(
                _pp.AnyPreservationPolicy(policies) if policies else None
            ),
            best_fn=(lambda m: m[config.monitor]) if config.save_top_k else None,
            best_mode=config.mode,
            create=True,
            # Synchronous orbax commits: orbax's own async thread raced with
            # donated device buffers over the TPU tunnel (observed: composite
            # finalize FileNotFoundError on the metrics item mid-training,
            # leaving only a *.orbax-checkpoint-tmp dir).  Async-ness lives
            # in OUR worker, which owns an undonated snapshot.
            enable_async_checkpointing=False,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)
        self._worker: Optional["threading.Thread"] = None
        self._worker_error: list[BaseException] = []
        self._snapshot_fn = None

    def _snapshot(self, leaves):
        """Fresh on-device copies of every device-array leaf (one dispatch)."""
        import jax
        import jax.numpy as jnp

        if self._snapshot_fn is None:
            # No donation → fresh output buffers (verified: the copies
            # survive a subsequent donating train step; jnp.copy defeats
            # jit's identity-output forwarding).
            self._snapshot_fn = jax.jit(lambda xs: [jnp.copy(x) for x in xs])
        return self._snapshot_fn(leaves)

    def _join(self) -> None:
        if self._worker is not None:
            self._worker.join()
            self._worker = None
        if self._worker_error:
            err, self._worker_error = self._worker_error[0], []
            raise RuntimeError("background checkpoint save failed") from err

    def save(
        self,
        step: int,
        state: Any,
        metrics: Optional[Mapping[str, float]] = None,
        blocking: bool = False,
    ):
        import jax
        import threading

        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        self._join()  # at most one save in flight; surface prior errors

        if jax.process_count() > 1:
            # Multi-host: orbax coordinates the distributed save itself —
            # every process writes exactly its addressable shards, so the
            # single-host host-drain pipeline (which device_gets every leaf)
            # does not apply.  The jitted snapshot still defends against the
            # caller's donated buffers; the commit is synchronous because all
            # processes must participate in the same save collectively.
            leaves, treedef = jax.tree_util.tree_flatten(state)
            is_dev = [isinstance(x, jax.Array) for x in leaves]
            dev_leaves = [x for x, d in zip(leaves, is_dev) if d]
            snap = iter(self._snapshot(dev_leaves) if dev_leaves else [])
            tree = jax.tree_util.tree_unflatten(
                treedef, [next(snap) if d else x for x, d in zip(leaves, is_dev)]
            )
            self._mgr.save(
                step, args=ocp.args.StandardSave(tree), metrics=metrics or None
            )
            self._mgr.wait_until_finished()
            return

        leaves, treedef = jax.tree_util.tree_flatten(state)
        is_dev = [isinstance(x, jax.Array) for x in leaves]
        dev_leaves = [x for x, d in zip(leaves, is_dev) if d]
        try:
            snap = self._snapshot(dev_leaves) if dev_leaves else []
        except Exception:
            # e.g. no HBM headroom for the copy — fall back to a blocking
            # host pull of the original (still-valid, pre-next-step) buffers.
            snap = dev_leaves
            blocking = True
        for leaf in snap:  # pipeline the D2H copies (latency, not serial RTs)
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()

        def commit():
            it = iter(jax.device_get(snap))
            host = [next(it) if d else x for x, d in zip(leaves, is_dev)]
            tree = jax.tree_util.tree_unflatten(treedef, host)
            self._mgr.save(
                step, args=ocp.args.StandardSave(tree), metrics=metrics or None
            )

        if blocking:
            commit()
            return
        self._worker_error = []

        def run():
            try:
                commit()
            except BaseException as e:  # surfaced on the next save()/wait()
                self._worker_error.append(e)

        # Non-daemon: interpreter shutdown (incl. Ctrl-C / uncaught exception
        # in the train loop) waits for the in-flight commit instead of
        # killing it mid-write and stranding a *.orbax-checkpoint-tmp dir.
        self._worker = threading.Thread(
            target=run, name=f"ckpt-save-{step}", daemon=False
        )
        self._worker.start()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.config.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def restore_tree(self, step: Optional[int] = None) -> Any:
        """Restore the raw saved pytree WITHOUT a template (numpy leaves).

        For consumers that need a subtree of a checkpoint whose full
        structure they can't reconstruct — e.g. evaluation loading
        ``params`` out of a train checkpoint that also holds the optimizer
        state (StandardRestore with a partial template raises a structure
        mismatch)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.config.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore())

    def restore_params(self, step: Optional[int] = None) -> Any:
        """Best-val (else latest) template-free restore, unwrapping the
        ``params`` subtree out of a full TrainState checkpoint.

        The shared eval-side loading path (evaluate_diffusion,
        video_to_foley): the reference evaluates its best val checkpoint
        (reference README.md:168-217), and train checkpoints here hold
        step/params/opt_state so a partial template would mismatch."""
        if step is None:
            step = self.best_step()
        if step is None:
            step = self.latest_step()
        tree = self.restore_tree(step)
        if isinstance(tree, dict) and "params" in tree:
            return tree["params"]
        return tree

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def wait(self) -> None:
        self._join()
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._join()
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
