import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syncfusion_tpu.ops.fused_resblock import (
    _reference,
    fold_groupnorm_film,
    fused_affine_silu_conv,
)


def _inputs(b=2, l=512, c=16, cout=16, seed=0):
    ks = jax.random.split(jax.random.key(seed), 5)
    x = jax.random.normal(ks[0], (b, l, c), jnp.float32)
    scale = jax.random.normal(ks[1], (b, c)) * 0.1 + 1.0
    shift = jax.random.normal(ks[2], (b, c)) * 0.1
    w = jax.random.normal(ks[3], (3, c, cout)) * 0.1
    bias = jax.random.normal(ks[4], (cout,)) * 0.1
    return x, scale, shift, w, bias


def test_fused_matches_reference():
    x, scale, shift, w, b = _inputs()
    got = fused_affine_silu_conv(x, scale, shift, w, b, 128, True)
    ref = _reference(x, scale, shift, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_edge_blocks_zero_halo():
    """First/last tiles must see zero padding, matching conv SAME."""
    x, scale, shift, w, b = _inputs(b=1, l=256, c=8, cout=8, seed=1)
    got = fused_affine_silu_conv(x, scale, shift, w, b, 64, True)
    ref = _reference(x, scale, shift, w, b)
    np.testing.assert_allclose(np.asarray(got[:, :2]), np.asarray(ref[:, :2]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[:, -2:]), np.asarray(ref[:, -2:]),
                               atol=2e-5)


def test_fused_gradients_match_reference():
    x, scale, shift, w, b = _inputs(l=256, seed=2)

    def loss_fused(*a):
        return jnp.sum(fused_affine_silu_conv(*a, 128, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(_reference(*a) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, scale, shift, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, scale, shift, w, b)
    for a, r in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-4)


def test_fold_groupnorm_film_equivalence():
    """scale/shift folding must reproduce GN→FiLM exactly."""
    b, l, c, groups = 2, 64, 16, 4
    ks = jax.random.split(jax.random.key(3), 5)
    x = jax.random.normal(ks[0], (b, l, c))
    gamma = jax.random.normal(ks[1], (c,)) * 0.1 + 1.0
    beta = jax.random.normal(ks[2], (c,)) * 0.1
    fs = jax.random.normal(ks[3], (b, c)) * 0.2
    ft = jax.random.normal(ks[4], (b, c)) * 0.2

    scale, shift = fold_groupnorm_film(x, gamma, beta, fs, ft, groups)
    got = x * scale[:, None, :] + shift[:, None, :]

    from flax import linen as nn

    gn = nn.GroupNorm(num_groups=groups)
    ref = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
    ref = ref * (1.0 + fs[:, None, :]) + ft[:, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_folded_matches_reference():
    from syncfusion_tpu.ops.fused_resblock import folded_affine_silu_conv

    for c, cout, fold in [(8, 8, 16), (16, 16, 8), (32, 16, 4)]:
        x, scale, shift, w, b = _inputs(b=2, l=256, c=c, cout=cout, seed=c)
        got = folded_affine_silu_conv(x, scale, shift, w, b, fold=fold)
        ref = _reference(x, scale, shift, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5,
                                   err_msg=f"c={c} fold={fold}")


def test_folded_gradients_flow():
    from syncfusion_tpu.ops.fused_resblock import folded_affine_silu_conv

    x, scale, shift, w, b = _inputs(b=1, l=128, c=8, cout=8, seed=9)
    g = jax.grad(lambda x: jnp.sum(folded_affine_silu_conv(x, scale, shift, w, b, 16) ** 2))(x)
    g_ref = jax.grad(lambda x: jnp.sum(_reference(x, scale, shift, w, b) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


def test_blocked_matches_reference():
    from syncfusion_tpu.ops.fused_resblock import fused_affine_silu_conv_blocked

    x, scale, shift, w, b = _inputs(b=2, l=512, c=16, cout=16, seed=4)
    got = fused_affine_silu_conv_blocked(x, scale, shift, w, b, block_l=128,
                                         interpret=True)
    ref = _reference(x, scale, shift, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_blocked_single_block():
    from syncfusion_tpu.ops.fused_resblock import fused_affine_silu_conv_blocked

    x, scale, shift, w, b = _inputs(b=1, l=128, c=8, cout=8, seed=5)
    got = fused_affine_silu_conv_blocked(x, scale, shift, w, b, block_l=128,
                                         interpret=True)
    ref = _reference(x, scale, shift, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
