"""Progressive distillation (train/distill.py) unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from syncfusion_tpu.models.encoder1d import Encoder1d
from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion
from syncfusion_tpu.models.unet1d import UNet1d
from syncfusion_tpu.train.distill import DistillConfig, ProgressiveDistiller, _rotate

L = 1024


def tiny_model():
    return SyncFusionDiffusion(
        unet=UNet1d(
            channels=(4, 8, 16), factors=(1, 4, 4), items=(1, 1, 1),
            attentions=(0, 0, 1), cross_attentions=(1, 1, 1),
            context_channels=(2, 8, 0), attention_heads=2,
            attention_features=4, embedding_features=8,
            modulation_features=16, resnet_groups=2,
        ),
        onsets_encoder=Encoder1d(
            channels=2, multipliers=(1, 1, 4, 8), factors=(1, 4, 4),
            num_blocks=(1, 1, 1), resnet_groups=2,
        ),
    )


def test_one_step_target_reproduces_two_teacher_steps():
    """v* is an exact algebraic inverse: one rotation with v* == two with v1/v2."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 1)).astype(np.float32))
    v1 = jnp.asarray(rng.normal(size=(2, 64, 1)).astype(np.float32))
    v2 = jnp.asarray(rng.normal(size=(2, 64, 1)).astype(np.float32))
    phi, phi_h, phi_n = 0.9, 0.7, 0.5
    x_half = _rotate(x, v1, jnp.float32(phi_h - phi))
    x_next = _rotate(x_half, v2, jnp.float32(phi_n - phi_h))
    delta = jnp.float32(phi_n - phi)
    v_star = (x_next - jnp.cos(delta) * x) / jnp.sin(delta)
    np.testing.assert_allclose(
        np.asarray(_rotate(x, v_star, delta)), np.asarray(x_next), atol=1e-5
    )


def test_distill_halving_schedule_runs_and_descends():
    model = tiny_model()
    params = model.init(jax.random.key(0), L, batch=1)
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.normal(size=(4, L, 1)).astype(np.float32) * 0.1)
    onsets = jnp.zeros((4, L, 1)).at[:, 100, 0].set(1.0)

    losses = []
    dist = ProgressiveDistiller(
        model, DistillConfig(start_steps=8, final_steps=2, steps_per_round=6,
                             lr=1e-3),
    )
    out, n = dist.distill(
        params,
        batch_fn=lambda step: {"wav": wav, "onsets": onsets},
        key=jax.random.key(2),
        log_fn=lambda m: losses.append(m["distill_loss"]),
    )
    assert n == 2
    # same tree structure -> drops into the normal serving path
    assert jax.tree_util.tree_structure(out) == jax.tree_util.tree_structure(params)
    assert all(np.isfinite(l) for l in losses)
    # the student trains against a frozen teacher on a fixed batch: the
    # within-round loss should not blow up, and the final round must
    # improve on its first evaluation
    assert losses[-1] < losses[-2] * 5

    gen = model.sample(out, jnp.asarray(rng.normal(size=(1, L, 1)).astype(np.float32)),
                       onsets[:1], None, num_steps=n)
    assert gen.shape == (1, L, 1) and np.isfinite(np.asarray(gen)).all()


def test_guided_distillation_round_runs():
    """cfg_scale != 1 — the teacher is the CFG combine (one 2B forward)."""
    model = tiny_model()
    params = model.init(jax.random.key(0), L, batch=1)
    rng = np.random.default_rng(2)
    wav = jnp.asarray(rng.normal(size=(2, L, 1)).astype(np.float32) * 0.1)
    onsets = jnp.zeros((2, L, 1)).at[:, 100, 0].set(1.0)
    emb = jnp.asarray(rng.normal(size=(2, 1, 8)).astype(np.float32))

    dist = ProgressiveDistiller(
        model, DistillConfig(start_steps=4, final_steps=2, steps_per_round=2,
                             cfg_scale=2.0),
    )
    out, n = dist.distill(
        params,
        batch_fn=lambda step: {"wav": wav, "onsets": onsets, "embedding": emb},
        key=jax.random.key(3),
    )
    assert n == 2
    # guided loss differs from unguided at the same params/batch
    l_guided = dist.loss(params, params, jax.random.key(4), wav, onsets, emb, 2)
    l_plain = ProgressiveDistiller(
        model, DistillConfig(cfg_scale=1.0)
    ).loss(params, params, jax.random.key(4), wav, onsets, emb, 2)
    assert abs(float(l_guided) - float(l_plain)) > 1e-8
