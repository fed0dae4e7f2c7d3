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
