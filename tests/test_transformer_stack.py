import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syncfusion_tpu.models.melgan import MelGANGenerator, Vocoder, fold_weight_norm
from syncfusion_tpu.models.mingpt import (
    GPTConfig,
    GPTFeats,
    sample_tokens,
    top_k_filter,
)
from syncfusion_tpu.models.transformer_av import (
    column_major,
    column_major_inverse,
)

TINY_GPT = GPTConfig(vocab_size=32, block_size=64, n_layer=2, n_head=2, n_embd=32)


@pytest.fixture(scope="module")
def gpt():
    net = GPTFeats(TINY_GPT)
    toks = jnp.zeros((1, 10), jnp.int32)
    feats = jnp.zeros((1, 6, 8))
    params = jax.jit(lambda: net.init(jax.random.key(0), toks, feats))()
    return net, params


def test_gpt_logits_shape(gpt):
    net, params = gpt
    toks = jnp.zeros((2, 10), jnp.int32)
    feats = jnp.zeros((2, 6, 8))
    logits = net.apply(params, toks, feats)
    assert logits.shape == (2, 16, 32)


def test_gpt_causality(gpt):
    """Changing a future token must not affect earlier logits."""
    net, params = gpt
    feats = jnp.zeros((1, 6, 8))
    a = jnp.asarray([[1, 2, 3, 4, 5]], jnp.int32)
    b = a.at[0, 4].set(9)
    la = net.apply(params, a, feats)
    lb = net.apply(params, b, feats)
    np.testing.assert_allclose(
        np.asarray(la[:, : 6 + 4]), np.asarray(lb[:, : 6 + 4]), atol=1e-5
    )
    assert not np.allclose(np.asarray(la[:, 6 + 4]), np.asarray(lb[:, 6 + 4]))


def test_gpt_feats_affect_output(gpt):
    net, params = gpt
    toks = jnp.ones((1, 5), jnp.int32)
    f0 = jnp.zeros((1, 6, 8))
    f1 = jnp.ones((1, 6, 8))
    assert not np.allclose(
        np.asarray(net.apply(params, toks, f0)[:, -1]),
        np.asarray(net.apply(params, toks, f1)[:, -1]),
    )


def test_top_k_filter():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0]])
    out = np.asarray(top_k_filter(logits, 2))
    assert np.isneginf(out[0, 0]) and np.isneginf(out[0, 3])
    assert out[0, 1] == 5.0 and out[0, 2] == 3.0


def test_sample_tokens_shapes_and_range(gpt):
    net, params = gpt
    feats = jnp.zeros((2, 6, 8))
    prefix = jnp.ones((2, 4), jnp.int32)
    out = sample_tokens(
        lambda p, t, f: net.apply(p, t, f), params, feats, prefix, 7,
        jax.random.key(0), top_k=8,
    )
    assert out.shape == (2, 11)
    np.testing.assert_array_equal(np.asarray(out[:, :4]), np.asarray(prefix))
    sampled = np.asarray(out[:, 4:])
    assert (sampled >= 0).all() and (sampled < 32).all()


def test_sample_tokens_greedy_deterministic(gpt):
    net, params = gpt
    feats = jnp.zeros((1, 6, 8))
    prefix = jnp.ones((1, 4), jnp.int32)
    a = sample_tokens(lambda p, t, f: net.apply(p, t, f), params, feats, prefix,
                      5, jax.random.key(0), greedy=True)
    b = sample_tokens(lambda p, t, f: net.apply(p, t, f), params, feats, prefix,
                      5, jax.random.key(1), greedy=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_column_major_roundtrip():
    grid = jnp.arange(2 * 5 * 10).reshape(2, 5, 10)
    seq = column_major(grid)
    # first 5 entries = first column (time-major order)
    np.testing.assert_array_equal(np.asarray(seq[0, :5]), np.asarray(grid[0, :, 0]))
    back = column_major_inverse(seq)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(grid))


# ------------------------------------------------------------------ melgan
def test_melgan_upsamples_256x():
    gen = MelGANGenerator(ngf=4, n_residual_layers=1)
    mel = jnp.zeros((1, 20, 80))
    v = jax.jit(lambda: gen.init(jax.random.key(0), mel))()
    wav = gen.apply(v, mel)
    assert wav.shape == (1, 20 * 256)
    assert float(jnp.abs(wav).max()) <= 1.0


def test_fold_weight_norm():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(8, 4, 3)).astype(np.float32)
    g = rng.uniform(0.5, 2.0, size=(8, 1, 1)).astype(np.float32)
    w = fold_weight_norm(v, g)
    norms = np.sqrt((w ** 2).sum(axis=(1, 2)))
    np.testing.assert_allclose(norms, g[:, 0, 0], rtol=1e-5)


def test_vocoder_facade_random_weights():
    voc = Vocoder()
    mel = np.random.default_rng(0).random((1, 80, 20)).astype(np.float32)
    wav = voc(mel)
    assert wav.shape == (1, 20 * 256)
