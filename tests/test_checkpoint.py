import jax.numpy as jnp
import numpy as np
import pytest

from syncfusion_tpu.core.checkpoint import (
    CheckpointConfig,
    Checkpointer,
    flatten,
    unflatten,
)


def _state(v: float):
    return {"params": {"w": jnp.full((4, 4), v)}, "step": jnp.asarray(int(v))}


def test_save_restore_roundtrip(tmp_path):
    ckpt = Checkpointer(CheckpointConfig(directory=tmp_path / "ck"))
    state = _state(3.0)
    ckpt.save(1, state, {"valid_loss": 0.5})
    ckpt.wait()
    restored = ckpt.restore(_state(0.0))
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.full((4, 4), 3.0))
    assert int(restored["step"]) == 3
    ckpt.close()


def test_best_k_tracking(tmp_path):
    ckpt = Checkpointer(CheckpointConfig(
        directory=tmp_path / "ck", monitor="valid_loss", save_top_k=1,
        save_last=True,
    ))
    for step, loss in [(1, 0.9), (2, 0.3), (3, 0.7), (4, 0.8)]:
        ckpt.save(step, _state(float(step)), {"valid_loss": loss})
    ckpt.wait()
    assert ckpt.best_step() == 2
    assert ckpt.latest_step() == 4
    # Lightning retention: best-1 AND always the last — NOT the best two
    # by metric (which would have pruned the final checkpoint here).
    assert sorted(ckpt._mgr.all_steps()) == [2, 4]
    best = ckpt.restore(_state(0.0), step=ckpt.best_step())
    assert int(best["step"]) == 2
    ckpt.close()


def test_restore_missing_raises(tmp_path):
    ckpt = Checkpointer(CheckpointConfig(directory=tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        ckpt.restore(_state(0.0))
    ckpt.close()


def test_async_save_survives_donation(tmp_path):
    """save() snapshots on-device BEFORE returning: a donating update that
    invalidates the caller's buffers right after must not corrupt the commit
    (this is the exact trainer pattern — jit(donate_argnums=(0,)))."""
    import jax

    ckpt = Checkpointer(CheckpointConfig(directory=tmp_path / "ck"))
    state = _state(5.0)
    ckpt.save(1, state, {"valid_loss": 0.1})
    donating = jax.jit(
        lambda s: jax.tree_util.tree_map(lambda x: x * 0 - 1, s),
        donate_argnums=(0,),
    )
    state = donating(state)  # invalidates the old buffers
    ckpt.wait()
    restored = ckpt.restore(_state(0.0))
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.full((4, 4), 5.0))
    ckpt.close()


def test_async_save_surfaces_worker_error(tmp_path, monkeypatch):
    ckpt = Checkpointer(CheckpointConfig(directory=tmp_path / "ck"))

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(ckpt._mgr, "save", boom)
    ckpt.save(1, _state(1.0))  # fails on the worker thread
    with pytest.raises(RuntimeError, match="background checkpoint save"):
        ckpt.wait()
    ckpt.close()


def test_mixed_host_leaves_roundtrip(tmp_path):
    """Non-device leaves (python ints from distill metadata) pass through."""
    ckpt = Checkpointer(CheckpointConfig(directory=tmp_path / "ck"))
    state = {"params": {"w": jnp.ones((2,))}, "num_steps": 8}
    ckpt.save(3, state)
    ckpt.wait()
    restored = ckpt.restore({"params": {"w": jnp.zeros((2,))}, "num_steps": 0})
    assert int(restored["num_steps"]) == 8
    ckpt.close()


def test_flatten_unflatten():
    tree = {"a": {"b": 1, "c": {"d": 2}}, "e": 3}
    flat = flatten(tree)
    assert flat == {"a.b": 1, "a.c.d": 2, "e": 3}
    assert unflatten(flat) == tree
