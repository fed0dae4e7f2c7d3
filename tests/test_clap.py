import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syncfusion_tpu.models.clap.htsat import (
    CLAP_SAMPLES,
    HTSAT,
    clap_mel,
    prepare_audio,
    reshape_mel_to_image,
)
from syncfusion_tpu.models.clap.roberta import RobertaModel
from syncfusion_tpu.models.clap.swin import (
    relative_position_index,
    shifted_window_mask,
    window_partition,
    window_reverse,
)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 16 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 16, 3)
    w = window_partition(x, 8)
    assert w.shape == (2 * 4, 64, 3)
    back = window_reverse(w, 8, 16, 16)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_range():
    idx = relative_position_index(8)
    assert idx.shape == (64, 64)
    assert idx.min() >= 0 and idx.max() < (2 * 8 - 1) ** 2
    assert idx[0, 0] == idx[5, 5]  # diagonal = same relative offset


def test_shifted_window_mask_blocks_cross_window():
    m = shifted_window_mask(16, 16, 8, 4)
    assert m.shape == (4, 64, 64)
    assert set(np.unique(m)) <= {0.0, -100.0}
    assert (m == -100.0).any()


def test_clap_mel_shape():
    wav = jnp.zeros((2, CLAP_SAMPLES))
    mel = clap_mel(wav)
    assert mel.shape == (2, CLAP_SAMPLES // 480 + 1, 64)


def test_reshape_mel_to_image():
    mel = jnp.arange(1 * 1001 * 64, dtype=jnp.float32).reshape(1, 1001, 64)
    img = reshape_mel_to_image(mel)
    assert img.shape == (1, 256, 256, 1)
    # first vertical band = freq bins of the first time quarter
    np.testing.assert_allclose(
        np.asarray(img[0, :64, 0, 0]), np.asarray(mel[0, 0, :]), atol=0
    )


def test_prepare_audio_pad_and_truncate():
    short = np.ones((1, 1000), np.float32)
    out = prepare_audio(short, 2500)
    assert out.shape == (1, 2500)
    np.testing.assert_array_equal(out[:, :1000], short)  # repeat pad
    long = np.ones((1, 3000), np.float32)
    assert prepare_audio(long, 2500).shape == (1, 2500)


@pytest.mark.slow
def test_htsat_forward_shape():
    net = HTSAT()
    img = jnp.zeros((1, 256, 256, 1))
    v = jax.jit(lambda: net.init(jax.random.key(0), img))()
    out = jax.jit(lambda v, x: net.apply(v, x))(v, img)
    assert out.shape == (1, 768)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(v))
    # HTSAT-tiny Swin trunk ≈ 27-28M params
    assert 20e6 < n_params < 40e6


def test_roberta_forward_shape():
    net = RobertaModel(num_layers=2)
    ids = jnp.ones((2, 16), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    v = jax.jit(lambda: net.init(jax.random.key(0), ids, mask))()
    out = net.apply(v, ids, mask)
    assert out.shape == (2, 16, 768)


def test_roberta_mask_blocks_padding():
    """Changing masked-out tokens must not affect unmasked outputs."""
    net = RobertaModel(num_layers=1)
    ids_a = jnp.asarray([[5, 6, 7, 1, 1]], jnp.int32)
    ids_b = jnp.asarray([[5, 6, 7, 1, 1]], jnp.int32).at[0, 3].set(99)
    mask = jnp.asarray([[1, 1, 1, 0, 0]], jnp.int32)
    v = jax.jit(lambda: net.init(jax.random.key(0), ids_a, mask))()
    out_a = net.apply(v, ids_a, mask)
    out_b = net.apply(v, ids_b, mask)
    np.testing.assert_allclose(
        np.asarray(out_a[:, :3]), np.asarray(out_b[:, :3]), atol=1e-5
    )


def test_clap_embedder_audio_path():
    """End-to-end embed_audio with random weights: shape + normalization +
    int16-roundtrip invariance for in-range audio."""
    from syncfusion_tpu.models.clap.model import ClapEmbedder

    emb = ClapEmbedder()
    wav = np.random.default_rng(0).normal(size=(2, 24000, 1)).astype(np.float32) * 0.1
    out = emb.embed_audio(wav)
    assert out.shape == (2, 1, 512)
    norms = np.linalg.norm(out[:, 0, :], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
