import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syncfusion_tpu.ops.attention import attention_reference, flash_attention


def _rand_qkv(b=1, l=512, h=2, d=64, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    shape = (b, l, h, d)
    return tuple(jax.random.normal(k, shape, jnp.float32) * 0.5 for k in ks)


def test_flash_attention_matches_reference():
    q, k, v = _rand_qkv()
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_causal():
    q, k, v = _rand_qkv(l=256, seed=1)
    out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128,
                          interpret=True)
    ref = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_multi_batch_heads():
    q, k, v = _rand_qkv(b=2, l=256, h=4, d=32, seed=2)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_rejects_ragged_length():
    q, k, v = _rand_qkv(l=300)
    with pytest.raises(AssertionError):
        flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)


def test_flash_attention_gradients_match_reference():
    """Custom-VJP backward kernels vs XLA attention gradients (f32)."""
    rng = np.random.default_rng(3)
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 256, 2, 64)).astype(np.float32))
        for _ in range(3)
    )
    w = jnp.asarray(rng.normal(size=(2, 256, 2, 64)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, block_q=128, block_k=128, interpret=True) * w
        )

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=f"d{name}",
        )


def test_flash_attention_gradients_causal():
    rng = np.random.default_rng(4)
    q, k, v = (
        jnp.asarray(rng.normal(size=(1, 256, 2, 64)).astype(np.float32))
        for _ in range(3)
    )

    def loss_flash(q, k, v):
        return jnp.sum(
            jnp.square(flash_attention(q, k, v, causal=True, block_q=128,
                                       block_k=128, interpret=True))
        )

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(attention_reference(q, k, v, causal=True)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=f"d{name}",
        )
