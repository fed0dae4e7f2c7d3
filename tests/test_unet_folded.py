"""Folded-layout UNet execution is numerically equivalent to the plain path.

The folded apply (models/unet1d_folded.py) runs shallow levels in
channel-major (B, L/f, C*f) space with probe-expanded width-3 kernels; these
tests pin exact equivalence (float32 round-off) against UNet1d.apply for
forward, CFG-mask, no-embedding, gradient, and end-to-end sampling paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion
from syncfusion_tpu.models.unet1d import UNet1d
from syncfusion_tpu.models.unet1d_folded import compute_folds, folded_apply
from syncfusion_tpu.ops.folded import fold, unfold

L = 4096


def small_unet():
    # Flagship-shaped: narrow shallow levels, attention only at the deepest.
    return UNet1d(
        channels=(8, 32, 64, 128), factors=(1, 4, 4, 4), items=(1, 2, 2, 2),
        attentions=(0, 0, 0, 1), cross_attentions=(1, 1, 1, 1),
        context_channels=(2, 8, 16, 32), resnet_groups=8,
    )


@pytest.fixture(scope="module")
def setup():
    u = small_unet()
    x = jax.random.normal(jax.random.key(0), (2, L, 1))
    ctx = [
        jax.random.normal(jax.random.key(i + 1), (2, L // (4 ** i), c))
        for i, c in enumerate((2, 8, 16))
    ] + [None]
    emb = jax.random.normal(jax.random.key(9), (2, 1, 512))
    sigma = jnp.array([0.3, 0.8])
    p = u.init(
        {"params": jax.random.key(5), "cfg": jax.random.key(6)},
        x, sigma, context=ctx, embedding=emb,
    )
    return u, p, x, sigma, ctx, emb


def test_fold_unfold_roundtrip():
    x = jax.random.normal(jax.random.key(0), (3, 64, 5))
    for f in (1, 2, 8):
        np.testing.assert_array_equal(np.asarray(unfold(fold(x, f), f)), np.asarray(x))
    # channel-major: folded channel c*f+k holds original (r*f+k, c)
    xf = fold(x, 8)
    assert xf.shape == (3, 8, 40)
    np.testing.assert_array_equal(
        np.asarray(xf[1, 2, 3 * 8 + 5]), np.asarray(x[1, 2 * 8 + 5, 3])
    )


def test_compute_folds_flagship_shape():
    u = small_unet()
    assert compute_folds(u, 256, L) == [16, 4, 1, 1]
    # smaller cap: only level 0 folds (up-concat width 16ch * 4 = 64)
    assert compute_folds(u, 64, L) == [4, 1, 1, 1]
    # cap below any legal fold
    assert compute_folds(u, 32, L) == [1, 1, 1, 1]
    # indivisible length
    assert compute_folds(u, 256, L + 4) == [1, 1, 1, 1]


def test_forward_equivalence(setup):
    u, p, x, sigma, ctx, emb = setup
    ref = u.apply(p, x, sigma, context=ctx, embedding=emb)
    out = folded_apply(u, p, x, sigma, context=ctx, embedding=emb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_cfg_mask_equivalence(setup):
    u, p, x, sigma, ctx, emb = setup
    mask = jnp.array([[[0.0]], [[1.0]]])
    ref = u.apply(p, x, sigma, context=ctx, embedding=emb, embedding_cfg_mask=mask)
    out = folded_apply(
        u, p, x, sigma, context=ctx, embedding=emb, embedding_cfg_mask=mask
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_no_embedding_equivalence(setup):
    u, p, x, sigma, ctx, emb = setup
    ref = u.apply(p, x, sigma, context=ctx)
    out = folded_apply(u, p, x, sigma, context=ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradient_equivalence(setup):
    u, p, x, sigma, ctx, emb = setup

    def loss(apply_plain):
        def f(p_):
            if apply_plain:
                y = u.apply(p_, x, sigma, context=ctx, embedding=emb)
            else:
                y = folded_apply(u, p_, x, sigma, context=ctx, embedding=emb)
            return jnp.mean(jnp.square(y))

        return f

    g_ref = jax.grad(loss(True))(p)
    g_out = jax.grad(loss(False))(p)
    for (k1, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g_out)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-6,
            err_msg=jax.tree_util.keystr(k1),
        )


def test_sample_equivalence():
    """End to end through SyncFusionDiffusion.sample with fold_cap set."""
    cfg = {
        "model": {
            "channels": [8, 32, 64, 128], "factors": [1, 4, 4, 4],
            "items": [1, 2, 2, 2], "attentions": [0, 0, 0, 1],
            "cross_attentions": [1, 1, 1, 1], "context_channels": [2, 8, 16, 32],
        },
        "onsets_encoder": {
            "channels": 8, "multipliers": [1, 2, 4, 4, 4],
            "factors": [1, 4, 4, 4], "num_blocks": [1, 1, 1, 1],
        },
    }
    plain = SyncFusionDiffusion.from_config(cfg)
    folded = SyncFusionDiffusion.from_config(cfg, fold_cap=256)
    assert folded.fold_cap == 256
    params = plain.init(jax.random.key(0), L, batch=1)
    noise = jax.random.normal(jax.random.key(1), (2, L, 1))
    onsets = jnp.zeros((2, L, 1)).at[:, 100, 0].set(1.0)
    emb = jax.random.normal(jax.random.key(2), (2, 1, 512))
    ref = plain.sample(params, noise, onsets, emb, num_steps=3, embedding_scale=2.0)
    out = folded.sample(params, noise, onsets, emb, num_steps=3, embedding_scale=2.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_loss_equivalence():
    cfg = None  # full defaults are too big for CPU; reuse small config via modules
    u = small_unet()
    x = jax.random.normal(jax.random.key(0), (2, L, 1))
    ctx = [
        jax.random.normal(jax.random.key(i + 1), (2, L // (4 ** i), c))
        for i, c in enumerate((2, 8, 16))
    ] + [None]
    emb = jax.random.normal(jax.random.key(9), (2, 1, 512))
    sigma = jnp.array([0.3, 0.8])
    p = u.init(
        {"params": jax.random.key(5), "cfg": jax.random.key(6)},
        x, sigma, context=ctx, embedding=emb,
    )
    from syncfusion_tpu.models.diffusion import v_diffusion_loss
    from syncfusion_tpu.models.unet1d_folded import make_folded_apply

    key = jax.random.key(11)
    ref = v_diffusion_loss(
        u.apply, p, key, x, context=ctx, embedding=emb, embedding_mask_proba=0.5
    )
    out = v_diffusion_loss(
        make_folded_apply(u), p, key, x,
        context=ctx, embedding=emb, embedding_mask_proba=0.5,
    )
    # same key -> same CFG dropout draw -> equal at float32 round-off
    np.testing.assert_allclose(float(out), float(ref), atol=1e-5)

def test_forward_equivalence_strided_entry():
    """factors[0] != 1: the entry fold (folds[0]*factor) absorbs into the
    strided entry conv; exactness holds for that generalization too."""
    u = UNet1d(
        channels=(8, 32, 64), factors=(2, 4, 4), items=(1, 1, 1),
        attentions=(0, 0, 1), cross_attentions=(1, 1, 1),
        context_channels=(2, 8, 0), attention_heads=2, attention_features=4,
        embedding_features=8, modulation_features=16, resnet_groups=2,
    )
    L2 = 2048
    x = jax.random.normal(jax.random.key(0), (2, L2, 1))
    ctx = [
        jax.random.normal(jax.random.key(1), (2, L2 // 2, 2)),
        jax.random.normal(jax.random.key(2), (2, L2 // 8, 8)),
        None,
    ]
    emb = jax.random.normal(jax.random.key(3), (2, 1, 8))
    sigma = jnp.array([0.3, 0.8])
    p = u.init(
        {"params": jax.random.key(5), "cfg": jax.random.key(6)},
        x, sigma, context=ctx, embedding=emb,
    )
    assert compute_folds(u, 256, L2) == [16, 4, 1]
    ref = u.apply(p, x, sigma, context=ctx, embedding=emb)
    out = folded_apply(u, p, x, sigma, context=ctx, embedding=emb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_stats_path_equivalence(setup):
    """fused_stats=True (producer-side-stats Pallas path, interpret mode on
    CPU) matches the plain folded execution at f32 round-off."""
    u, p, x, sigma, ctx, emb = setup
    base = folded_apply(u, p, x, sigma, context=ctx, embedding=emb,
                        fold_cap=256)
    u_fs = u.clone(fused_stats=True)
    got = folded_apply(u_fs, p, x, sigma, context=ctx, embedding=emb,
                       fold_cap=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-4, atol=2e-4)


def test_deep_split_full_path_unchanged(setup):
    """deep_split with no cache runs the FULL network — identical output,
    plus the cacheable deep feature with the documented shape."""
    u, p, x, sigma, ctx, emb = setup
    base = folded_apply(u, p, x, sigma, context=ctx, embedding=emb)
    out, deep = folded_apply(
        u, p, x, sigma, context=ctx, embedding=emb,
        deep_split=2, return_deep=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))
    folds = compute_folds(u, 256, L)
    # feature entering up-level 1: level-1 resolution, channels[1], folded
    assert deep.shape == (2, (L // 4) // folds[1], 32 * folds[1])


def test_deep_cache_substitution_exact(setup):
    """A cached call with a FRESH cache (same x, same sigma) reproduces the
    full forward exactly: shallow recompute + cached deep == full network."""
    u, p, x, sigma, ctx, emb = setup
    full, deep = folded_apply(
        u, p, x, sigma, context=ctx, embedding=emb,
        deep_split=2, return_deep=True,
    )
    cached = folded_apply(
        u, p, x, sigma, context=ctx, embedding=emb,
        deep_split=2, deep_cache=deep,
    )
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(full))
    # stale cache (different x) -> approximation, not equality
    x2 = x + 0.1
    approx = folded_apply(
        u, p, x2, sigma, context=ctx, embedding=emb,
        deep_split=2, deep_cache=deep,
    )
    full2 = folded_apply(u, p, x2, sigma, context=ctx, embedding=emb)
    assert np.all(np.isfinite(np.asarray(approx)))
    assert np.abs(np.asarray(approx) - np.asarray(full2)).max() > 0


def test_deep_split_validation(setup):
    u, p, x, sigma, ctx, emb = setup
    with pytest.raises(ValueError, match="deep_split"):
        folded_apply(u, p, x, sigma, context=ctx, embedding=emb, deep_split=4)


def test_deep_cache_sampling():
    """End to end: deep_cache_interval through SyncFusionDiffusion.sample
    (both samplers, with and without guidance band); close to the no-cache
    trajectory and exactly reproducible."""
    cfg = {
        "model": {
            "channels": [8, 32, 64, 128], "factors": [1, 4, 4, 4],
            "items": [1, 2, 2, 2], "attentions": [0, 0, 0, 1],
            "cross_attentions": [1, 1, 1, 1], "context_channels": [2, 8, 16, 32],
        },
        "onsets_encoder": {
            "channels": 8, "multipliers": [1, 2, 4, 4, 4],
            "factors": [1, 4, 4, 4], "num_blocks": [1, 1, 1, 1],
        },
    }
    folded = SyncFusionDiffusion.from_config(cfg, fold_cap=256)
    params = folded.init(jax.random.key(0), L, batch=1)
    noise = jax.random.normal(jax.random.key(1), (2, L, 1))
    onsets = jnp.zeros((2, L, 1)).at[:, 100, 0].set(1.0)
    emb = jax.random.normal(jax.random.key(2), (2, 1, 512))
    for sampler in ("ddim", "dpm"):
        for band in (None, (0.2, 0.8)):
            base = folded.sample(
                params, noise, onsets, emb, num_steps=6,
                embedding_scale=2.0, guidance_interval=band, sampler=sampler,
            )
            out = folded.sample(
                params, noise, onsets, emb, num_steps=6,
                embedding_scale=2.0, guidance_interval=band, sampler=sampler,
                deep_cache_interval=2, deep_split=2,
            )
            again = folded.sample(
                params, noise, onsets, emb, num_steps=6,
                embedding_scale=2.0, guidance_interval=band, sampler=sampler,
                deep_cache_interval=2, deep_split=2,
            )
            assert np.all(np.isfinite(np.asarray(out)))
            np.testing.assert_array_equal(np.asarray(out), np.asarray(again))
            diff = np.abs(np.asarray(out) - np.asarray(base)).max()
            assert 0 < diff < 1.0, (sampler, band, diff)

    # non-uniform cadence (deep_cache_pow != 1): same refresh count, valid
    # output, different trajectory from both no-cache and uniform cadence;
    # pow=1.0 is exactly the default path.
    base = folded.sample(params, noise, onsets, emb, num_steps=6,
                         embedding_scale=2.0)
    uni = folded.sample(params, noise, onsets, emb, num_steps=6,
                        embedding_scale=2.0, deep_cache_interval=2,
                        deep_split=2)
    uni_pow1 = folded.sample(params, noise, onsets, emb, num_steps=6,
                             embedding_scale=2.0, deep_cache_interval=2,
                             deep_split=2, deep_cache_pow=1.0)
    np.testing.assert_array_equal(np.asarray(uni), np.asarray(uni_pow1))
    nu = folded.sample(params, noise, onsets, emb, num_steps=6,
                       embedding_scale=2.0, deep_cache_interval=2,
                       deep_split=2, deep_cache_pow=2.0)
    assert np.all(np.isfinite(np.asarray(nu)))
    assert np.abs(np.asarray(nu) - np.asarray(base)).max() > 0
    assert np.abs(np.asarray(nu) - np.asarray(uni)).max() > 0

    plain = SyncFusionDiffusion.from_config(cfg)
    with pytest.raises(ValueError, match="folded"):
        plain.sample(
            params, noise, onsets, emb, num_steps=2,
            deep_cache_interval=2,
        )
