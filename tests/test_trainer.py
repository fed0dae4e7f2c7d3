import jax
import jax.numpy as jnp
import numpy as np

from syncfusion_tpu.core.mesh import create_mesh, shard_batch
from syncfusion_tpu.models.encoder1d import Encoder1d
from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion
from syncfusion_tpu.models.unet1d import UNet1d
from syncfusion_tpu.train.diffusion_trainer import (
    DiffusionTrainer,
    OptimizerConfig,
)

L = 256
ENC = dict(in_channels=1, channels=2, multipliers=(1, 1, 4, 8), factors=(1, 4, 4),
           num_blocks=(1, 1, 1), resnet_groups=2)
UNET = dict(in_channels=1, channels=(4, 8, 16), factors=(1, 4, 4), items=(1, 1, 1),
            attentions=(0, 0, 1), cross_attentions=(1, 1, 1), context_channels=(2, 8, 16),
            attention_heads=2, attention_features=4, embedding_features=8,
            modulation_features=16, resnet_groups=2)


def _make_batch(b=8):
    rng = np.random.default_rng(0)
    onsets = np.zeros((b, L, 1), np.float32)
    onsets[:, rng.integers(0, L, size=8), 0] = 1.0  # non-degenerate track
    return {
        "wav": rng.normal(size=(b, L, 1)).astype(np.float32),
        "onsets": onsets,
        "embedding": rng.normal(size=(b, 1, 8)).astype(np.float32),
    }


def _model():
    return SyncFusionDiffusion(unet=UNet1d(**UNET), onsets_encoder=Encoder1d(**ENC))


def test_train_step_reduces_loss_single_device():
    model = _model()
    params = model.init(jax.random.key(0), L, batch=1)
    trainer = DiffusionTrainer(model, OptimizerConfig(lr=1e-3))
    state = trainer.create_state(params)
    batch = jax.tree_util.tree_map(jnp.asarray, _make_batch(4))
    losses = []
    for i in range(5):
        state, metrics = trainer.train_step(state, batch, jax.random.key(i % 2))
        losses.append(float(metrics["train_loss"]))
    assert int(state.step) == 5
    assert np.isfinite(losses).all()
    # same key at step 0 and 4: loss must drop on the identical subproblem
    assert losses[4] < losses[0]


def test_sharded_loss_and_grads_match_replicated():
    """The pjit DP computation must match single-device numerics.

    (Params after an AdamW step are NOT compared: the first Adam update is
    ~lr·sign(g), so fp-reduction-order noise on near-zero grads flips signs.
    Loss and gradients are the right invariants.)
    """
    model = _model()
    params = model.init(jax.random.key(0), L, batch=1)
    batch_np = _make_batch(8)
    key = jax.random.key(42)

    def loss_fn(p, batch):
        return model.loss(p, key, batch["wav"], batch["onsets"], batch["embedding"])

    batch_single = jax.tree_util.tree_map(jnp.asarray, batch_np)
    l_single, g_single = jax.value_and_grad(loss_fn)(params, batch_single)

    mesh = create_mesh()
    batch_mesh = shard_batch(batch_np, mesh)
    l_mesh, g_mesh = jax.jit(jax.value_and_grad(loss_fn))(params, batch_mesh)

    np.testing.assert_allclose(float(l_mesh), float(l_single), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_single), jax.tree_util.tree_leaves(g_mesh)):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4 * scale + 1e-7
        )


def test_train_step_runs_on_mesh():
    model = _model()
    params = model.init(jax.random.key(0), L, batch=1)
    mesh = create_mesh()
    trainer = DiffusionTrainer(model, OptimizerConfig(), mesh=mesh)
    state = trainer.create_state(params)
    state, metrics = trainer.train_step(
        state, shard_batch(_make_batch(8), mesh), jax.random.key(1)
    )
    assert int(state.step) == 1 and np.isfinite(float(metrics["train_loss"]))


def test_grad_accumulation_steps_optimizer_every_k():
    model = _model()
    params = model.init(jax.random.key(0), L, batch=1)
    trainer = DiffusionTrainer(model, OptimizerConfig(accumulate_grad_batches=2))
    state = trainer.create_state(params)
    batch = jax.tree_util.tree_map(jnp.asarray, _make_batch(2))
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, _ = trainer.train_step(state, batch, jax.random.key(0))
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))  # accumulating
    state, _ = trainer.train_step(state, batch, jax.random.key(1))
    p2 = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.array_equal(np.asarray(p0), np.asarray(p2))  # applied


def test_eval_step(rng):
    model = _model()
    params = model.init(jax.random.key(0), L, batch=1)
    trainer = DiffusionTrainer(model)
    state = trainer.create_state(params)
    batch = jax.tree_util.tree_map(jnp.asarray, _make_batch(2))
    metrics = trainer.eval_step(state, batch, jax.random.key(9))
    assert np.isfinite(float(metrics["valid_loss"]))
