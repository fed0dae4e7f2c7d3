"""Style-transfer port: VGG19-prefix parity vs a torch reconstruction of
torchvision's vgg19 features (reference audio_generation_utils.py:205-334),
gram-matrix semantics, and optimization behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

from syncfusion_tpu.eval.style_transfer import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    Vgg19Prefix,
    convert_torch_vgg19,
    gram_matrix,
    load_specs_as_img,
    run_style_transfer,
    style_transfer_mel,
)

torch = pytest.importorskip("torch")


def _synth_vgg_state_dict(rng):
    """Random torch-format vgg19 ``features.*`` prefix (convs 0,2,5,7,10)."""
    sd = {}
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256)]
    for li, (cin, cout) in zip((0, 2, 5, 7, 10), chans):
        sd[f"features.{li}.weight"] = (
            rng.normal(size=(cout, cin, 3, 3)) / np.sqrt(cin * 9)
        ).astype(np.float32)
        sd[f"features.{li}.bias"] = (rng.normal(size=(cout,)) * 0.1).astype(np.float32)
    return sd


def _torch_prefix_acts(sd, img_nchw):
    """Reference semantics: Normalization → [conv → (loss taps) → relu →
    (pool)] with pre-ReLU activations tapped after each conv
    (get_style_model_and_losses, audio_generation_utils.py:205-268)."""
    import torch.nn.functional as F

    x = torch.from_numpy(img_nchw)
    mean = torch.tensor(IMAGENET_MEAN).view(-1, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(-1, 1, 1)
    x = (x - mean) / std
    acts = {}
    pool_before = {3: True, 5: True}
    for i, li in enumerate((0, 2, 5, 7, 10), start=1):
        if pool_before.get(i):
            x = F.max_pool2d(x, 2, 2)
        w = torch.from_numpy(sd[f"features.{li}.weight"])
        b = torch.from_numpy(sd[f"features.{li}.bias"])
        x = F.conv2d(x, w, b, padding=1)
        acts[f"conv_{i}"] = x.numpy().copy()
        x = torch.relu(x)
    return acts


def test_vgg19_prefix_parity(rng):
    sd = _synth_vgg_state_dict(rng)
    variables = convert_torch_vgg19(sd)
    img = rng.uniform(size=(1, 3, 32, 48)).astype(np.float32)

    ref = _torch_prefix_acts(sd, img)
    got = Vgg19Prefix().apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)))
    for l in ("conv_1", "conv_2", "conv_3", "conv_4", "conv_5"):
        np.testing.assert_allclose(
            np.asarray(got[l]).transpose(0, 3, 1, 2), ref[l],
            rtol=1e-4, atol=1e-4, err_msg=l,
        )


def test_gram_matrix_matches_reference_formula(rng):
    feat = rng.normal(size=(1, 6, 5, 4)).astype(np.float32)  # NHWC
    g = np.asarray(gram_matrix(jnp.asarray(feat)))
    f = feat.transpose(0, 3, 1, 2).reshape(4, 30)  # (B*C, H*W)
    ref = f @ f.T / (1 * 4 * 6 * 5)
    np.testing.assert_allclose(g, ref, rtol=1e-5, atol=1e-6)


def test_load_specs_as_img_uint8_roundtrip(rng):
    spec = rng.uniform(size=(80, 200)).astype(np.float32)
    img = np.asarray(load_specs_as_img(spec, spec_take_first=192))
    assert img.shape == (1, 80, 192, 3)
    # uint8 truncation then /255, replicated over RGB
    expect = (spec[:, :192] * 255).astype(np.uint8).astype(np.float32) / 255.0
    np.testing.assert_array_equal(img[0, :, :, 0], expect)
    np.testing.assert_array_equal(img[0, :, :, 1], img[0, :, :, 2])


def test_run_style_transfer_moves_toward_style(rng):
    sd = _synth_vgg_state_dict(rng)
    variables = convert_torch_vgg19(sd)
    # Content: horizontal ramp; style: high-frequency checkerboard texture.
    h, w = 16, 24
    content = np.tile(np.linspace(0.2, 0.8, w, dtype=np.float32), (h, 1))
    yy, xx = np.mgrid[:h, :w]
    style = ((yy + xx) % 2).astype(np.float32)
    c_img = load_specs_as_img(content, w)
    s_img = load_specs_as_img(style, w)

    out, final_loss = run_style_transfer(
        variables, c_img, s_img, num_steps=40, style_weight=1e4,
    )
    out = np.asarray(out)
    assert out.shape == c_img.shape
    assert np.all(out >= 0.0) and np.all(out <= 1.0)

    # Style loss decreased relative to the init (= content image).
    def style_dist(img):
        a = Vgg19Prefix().apply(variables, jnp.asarray(img))
        s = Vgg19Prefix().apply(variables, s_img)
        return float(
            sum(
                jnp.mean((gram_matrix(a[l]) - gram_matrix(s[l])) ** 2)
                for l in ("conv_1", "conv_2", "conv_3", "conv_4", "conv_5")
            )
        )

    assert style_dist(out) < 0.5 * style_dist(np.asarray(c_img))
    assert np.isfinite(final_loss)


def test_style_transfer_mel_helper(rng):
    sd = _synth_vgg_state_dict(rng)
    variables = convert_torch_vgg19(sd)
    content = rng.uniform(size=(80, 40)).astype(np.float32)
    style = rng.uniform(size=(80, 40)).astype(np.float32)
    mel = style_transfer_mel(
        variables, content, style, spec_take_first=32, num_steps=5
    )
    assert mel.shape == (80, 32)
    assert mel.min() >= 0.0 and mel.max() <= 1.0
