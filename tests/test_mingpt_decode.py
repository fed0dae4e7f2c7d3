import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syncfusion_tpu.models.mingpt import GPTConfig, GPTFeats, sample_tokens
from syncfusion_tpu.models.mingpt_decode import sample_tokens_cached

CFG = GPTConfig(vocab_size=32, block_size=64, n_layer=2, n_head=2, n_embd=16)


@pytest.fixture(scope="module")
def gpt():
    net = GPTFeats(CFG)
    toks = jnp.zeros((1, 8), jnp.int32)
    feats = jnp.zeros((1, 5, 4))
    params = jax.jit(lambda: net.init(jax.random.key(0), toks, feats))()
    return net, params


def test_cached_greedy_matches_uncached(gpt):
    net, params = gpt
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 4)), jnp.float32)
    prefix = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)

    ref = sample_tokens(lambda p, t, f: net.apply(p, t, f), params, feats,
                        prefix, 9, jax.random.key(0), greedy=True)
    got = sample_tokens_cached(params, feats, prefix, 9, jax.random.key(1),
                               config=CFG, greedy=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_cached_greedy_no_feats(gpt):
    net, params = gpt
    prefix = jnp.asarray([[7, 8]], jnp.int32)
    ref = sample_tokens(lambda p, t, f: net.apply(p, t, f), params, None,
                        prefix, 5, jax.random.key(0), greedy=True)
    got = sample_tokens_cached(params, None, prefix, 5, jax.random.key(1),
                               config=CFG, greedy=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_cached_topk_samples_in_range(gpt):
    net, params = gpt
    feats = jnp.zeros((1, 5, 4))
    prefix = jnp.ones((1, 4), jnp.int32)
    out = sample_tokens_cached(params, feats, prefix, 6, jax.random.key(2),
                               config=CFG, top_k=8)
    assert out.shape == (1, 10)
    sampled = np.asarray(out[:, 4:])
    assert (sampled >= 0).all() and (sampled < 32).all()
