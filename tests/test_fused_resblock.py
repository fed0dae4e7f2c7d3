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


# ------------------------------------------------- producer-side stats op
@pytest.mark.parametrize("with_residual", [False, True])
@pytest.mark.parametrize("nb", [1, 4])
def test_fused_conv_stats_matches_reference(rng, with_residual, nb):
    from syncfusion_tpu.ops.fused_resblock import (
        _stats_reference,
        fused_affine_silu_conv_stats,
    )

    b, c, cout, groups = 2, 24, 32, 8
    block_l = 64
    l = block_l * nb
    x = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.normal(size=(3, c, cout)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32) * 0.1)
    res = (
        jnp.asarray(rng.normal(size=(b, l, cout)).astype(np.float32))
        if with_residual else None
    )

    y, s, ss = fused_affine_silu_conv_stats(
        x, scale, shift, w, bias, residual=res, num_groups=groups,
        block_l=block_l, interpret=True,
    )
    y_ref, s_ref, ss_ref = _stats_reference(x, scale, shift, w, bias, res, groups)

    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ss_ref),
                               rtol=1e-4, atol=1e-2)


def test_folded_stats_affine_matches_folded_group_norm(rng):
    from syncfusion_tpu.ops.folded import (
        folded_group_norm,
        folded_group_stats,
        folded_stats_affine,
    )

    b, r, c, f, groups = 2, 32, 16, 4, 4
    x = jnp.asarray(rng.normal(size=(b, r, c * f)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    fs = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32) * 0.3)
    ft = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32) * 0.1)

    ref = folded_group_norm(x, gamma, beta, groups, f,
                            film_scale=fs, film_shift=ft)

    s, ss = folded_group_stats(x, groups)
    count = r * (c // groups) * f
    scale, shift = folded_stats_affine(s, ss, count, gamma, beta, groups, f,
                                       film_scale=fs, film_shift=ft)
    got = x.astype(jnp.float32) * scale[:, None, :] + shift[:, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_conv_stats_gradients(rng):
    """Stats-op VJP (recompute-through-reference) matches reference grads."""
    from syncfusion_tpu.ops.fused_resblock import (
        _stats_reference,
        fused_affine_silu_conv_stats,
    )

    b, c, cout, groups, l = 1, 8, 16, 4, 64
    x = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.normal(size=(3, c, cout)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32) * 0.1)
    res = jnp.asarray(rng.normal(size=(b, l, cout)).astype(np.float32))

    def f_fused(x, w, res):
        y, s, ss = fused_affine_silu_conv_stats(
            x, scale, shift, w, bias, res, num_groups=groups,
            block_l=32, interpret=True,
        )
        return jnp.sum(y**2) + jnp.sum(s) + jnp.sum(ss * 0.01)

    def f_ref(x, w, res):
        y, s, ss = _stats_reference(x, scale, shift, w, bias, res, groups)
        return jnp.sum(y**2) + jnp.sum(s) + jnp.sum(ss * 0.01)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(x, w, res)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, w, res)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_fused_vjps_trace_under_bf16(rng):
    """Regression: both custom VJPs must accept bf16 primals.

    The backward recomputes through a reference whose y output is x.dtype;
    a blanket f32 cotangent cast used to raise a dtype mismatch at the
    first grad trace whenever the UNet ran bf16 (the advertised training
    dtype)."""
    from syncfusion_tpu.ops.fused_resblock import (
        fused_affine_silu_conv,
        fused_affine_silu_conv_stats,
    )

    b, c, groups, l = 1, 8, 4, 64
    x = jnp.asarray(rng.normal(size=(b, l, c)), dtype=jnp.bfloat16)
    scale = jnp.ones((b, c), jnp.float32)
    shift = jnp.zeros((b, c), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, c, c)).astype(np.float32) * 0.2)
    bias = jnp.zeros((c,), jnp.float32)

    def f_plain(x):
        y = fused_affine_silu_conv(x, scale, shift, w, bias,
                                   block_l=32, interpret=True)
        assert y.dtype == jnp.bfloat16
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def f_stats(x):
        y, s, ss = fused_affine_silu_conv_stats(
            x, scale, shift, w, bias, None, num_groups=groups,
            block_l=32, interpret=True,
        )
        assert y.dtype == jnp.bfloat16
        return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(s - ss) * 0.01

    for f in (f_plain, f_stats):
        g = jax.grad(f)(x)
        assert g.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


def test_stats_kernel_tpu_mosaic_lowering():
    """Cross-platform TPU lowering must pass Mosaic's block-shape checks.

    Interpret mode skips Mosaic entirely, so a kernel can pass every
    equivalence test here yet fail to compile on the chip (regression:
    the (1, 1, G) stats blockspec violated the sublane-divisibility rule
    with array shape (8, 4, 8) — perf_sweep folded256_b4_stats crash).
    jax.export with platforms=["tpu"] runs the real Mosaic lowering on any
    host, catching that class of bug in CI.
    """
    from unittest import mock

    from jax import export

    from syncfusion_tpu.ops import fused_resblock as fr

    b, l, c, cout, g = 8, 16384, 64, 64, 8  # nb=4: the shape that crashed
    x = jnp.zeros((b, l, c), jnp.bfloat16)
    scale = jnp.ones((b, c))
    shift = jnp.zeros((b, c))
    w = jnp.zeros((3, c, cout), jnp.bfloat16)
    bias = jnp.zeros((cout,), jnp.bfloat16)

    def f(x, scale, shift, w, bias):
        return fr._fused_stats_forward(
            x, scale, shift, w, bias, num_groups=g, block_l=4096
        )

    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        exp = export.export(jax.jit(f), platforms=["tpu"])(x, scale, shift, w, bias)
    assert [tuple(a.shape) for a in exp.out_avals] == [
        (b, l, cout), (b, g), (b, g)
    ]


def test_flash_attention_tpu_mosaic_lowering():
    """Same cross-platform Mosaic gate for the flash-attention kernel."""
    from unittest import mock

    from jax import export

    from syncfusion_tpu.ops.attention import flash_attention

    q = jnp.zeros((2, 1024, 8, 64), jnp.bfloat16)  # (B, L, H, D)

    def f(q):
        return flash_attention(q, q, q)

    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        exp = export.export(jax.jit(f), platforms=["tpu"])(q)
    assert tuple(exp.out_avals[0].shape) == (2, 1024, 8, 64)
