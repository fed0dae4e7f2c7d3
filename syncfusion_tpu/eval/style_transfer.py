"""Spectrogram style transfer (VGG19 gram-matrix optimization).

Native port of the reference's legacy style-transfer generation path
(reference: CondFoleyGen/audio_generation_utils.py:205-334, reachable from
``gen_audio_condImage_fast(style_transfer=True)``,
audio_generation_scripts.py:686-697): the content image is the VQGAN
reconstruction mel of the reference audio, the style image the cond audio's
reconstruction mel, both loaded as RGB images in [0,1]; the input (init =
content) is optimized to match conv_4 content features and conv_1..conv_5
gram matrices of an ImageNet-pretrained VGG19, then averaged over RGB back
to a mel panel.

TPU-native design: the whole optimization is ONE jitted ``lax.scan`` over
optax's L-BFGS (the reference uses torch.optim.LBFGS with 300 closure
evaluations) — no Python-loop dispatch per step.  Only the first five convs
of VGG19 are ever evaluated (the reference trims the trunk after the last
loss, conv3_1), so the trunk here stops there by construction.

Weights: ImageNet VGG19 ``features.*`` torch state_dict → Flax via
``convert_torch_vgg19`` (env-gated download, like LPAPS/MelGAN weights).
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

# ImageNet normalization used by the reference (cnn_normalization_mean/std,
# audio_generation_scripts.py call site).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# VGG19 features config "E" prefix through conv3_1 — (out_channels, pool_before)
_VGG_PREFIX = (
    (64, False),   # conv_1 = conv1_1
    (64, False),   # conv_2 = conv1_2
    (128, True),   # conv_3 = conv2_1 (maxpool before)
    (128, False),  # conv_4 = conv2_2  ← content layer
    (256, True),   # conv_5 = conv3_1 (maxpool before) ← last style layer
)

CONTENT_LAYERS = ("conv_4",)
STYLE_LAYERS = ("conv_1", "conv_2", "conv_3", "conv_4", "conv_5")


class Vgg19Prefix(nn.Module):
    """First five convs of VGG19 ``features``; returns pre-ReLU activations
    ``{conv_1..conv_5}`` (the reference inserts its loss modules directly
    after each Conv2d, before the ReLU)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        # x: (B, H, W, 3) in [0,1]
        mean = jnp.asarray(IMAGENET_MEAN, self.dtype)
        std = jnp.asarray(IMAGENET_STD, self.dtype)
        h = (x.astype(self.dtype) - mean) / std
        acts: dict[str, jax.Array] = {}
        for i, (ch, pool_before) in enumerate(_VGG_PREFIX, start=1):
            if pool_before:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv_{i}")(h)
            acts[f"conv_{i}"] = h
            h = nn.relu(h)
        return acts


def convert_torch_vgg19(state_dict: Mapping[str, np.ndarray]) -> dict:
    """torchvision vgg19 ``features.*`` state_dict → ``Vgg19Prefix`` params.

    torchvision layer indices for the first five convs are 0,2,5,7,10
    (ReLU/MaxPool between).  Accepts torch tensors or numpy arrays.
    """
    idx = (0, 2, 5, 7, 10)
    params = {}
    for i, li in enumerate(idx, start=1):
        w = np.asarray(state_dict[f"features.{li}.weight"])  # (O,I,kh,kw)
        b = np.asarray(state_dict[f"features.{li}.bias"])
        params[f"conv_{i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),  # → (kh,kw,I,O)
            "bias": jnp.asarray(b),
        }
    return {"params": params}


def load_specs_as_img(spec: np.ndarray, spec_take_first: int = 192) -> jax.Array:
    """Mel panel in [0,1] → (1, 80, W, 3) RGB image, reproducing the
    reference's uint8 round-trip (load_specs_as_img,
    audio_generation_utils.py:32-43: ``Image.fromarray((spec*255).uint8)``
    → same-size Resize → ToTensor)."""
    spec = np.asarray(spec)[:, :spec_take_first]
    q = (spec * 255.0).astype(np.uint8).astype(np.float32) / 255.0
    img = np.repeat(q[..., None], 3, axis=-1)
    return jnp.asarray(img[None])


def gram_matrix(feat: jax.Array) -> jax.Array:
    """Reference gram (audio_generation_utils.py:46-58): features flattened
    to (B*C, H*W), G = FFᵀ / (B*C*H*W)."""
    b, h, w, c = feat.shape
    f = feat.transpose(0, 3, 1, 2).reshape(b * c, h * w)
    return (f @ f.T) / (b * c * h * w)


def style_content_loss(
    variables,
    input_img: jax.Array,
    content_targets: Mapping[str, jax.Array],
    style_grams: Mapping[str, jax.Array],
    style_weight: float,
    content_weight: float,
) -> jax.Array:
    acts = Vgg19Prefix().apply(variables, input_img)
    style = sum(
        jnp.mean((gram_matrix(acts[l]) - style_grams[l]) ** 2)
        for l in STYLE_LAYERS
    )
    content = sum(
        jnp.mean((acts[l] - content_targets[l]) ** 2) for l in CONTENT_LAYERS
    )
    return style_weight * style + content_weight * content


@functools.partial(jax.jit, static_argnames=("num_steps",))
def run_style_transfer(
    variables,
    content_img: jax.Array,
    style_img: jax.Array,
    input_img: jax.Array | None = None,
    num_steps: int = 300,
    style_weight: float = 1_000_000.0,
    content_weight: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Optimize ``input_img`` (default: content) to transfer the style
    image's texture.  Returns ``(image (1,H,W,3) in [0,1], final loss)``.

    One compiled scan over L-BFGS updates with a [0,1] clamp per step (the
    reference clamps inside every LBFGS closure)."""
    if input_img is None:
        input_img = content_img
    content_targets = {
        l: jax.lax.stop_gradient(a)
        for l, a in Vgg19Prefix().apply(variables, content_img).items()
        if l in CONTENT_LAYERS
    }
    style_grams = {
        l: jax.lax.stop_gradient(gram_matrix(a))
        for l, a in Vgg19Prefix().apply(variables, style_img).items()
        if l in STYLE_LAYERS
    }

    def loss_fn(img):
        return style_content_loss(
            variables, img, content_targets, style_grams,
            style_weight, content_weight,
        )

    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def step(carry, _):
        img, opt_state = carry
        value, grad = value_and_grad(img, state=opt_state)
        updates, opt_state = opt.update(
            grad, opt_state, img, value=value, grad=grad, value_fn=loss_fn
        )
        img = jnp.clip(optax.apply_updates(img, updates), 0.0, 1.0)
        return (img, opt_state), value

    init = (input_img, opt.init(input_img))
    (img, _), values = jax.lax.scan(step, init, None, length=num_steps)
    return img, values[-1]


def style_transfer_mel(
    variables,
    content_mel: np.ndarray,
    style_mel: np.ndarray,
    spec_take_first: int = 192,
    num_steps: int = 300,
    style_weight: float = 1_000_000.0,
    content_weight: float = 1.0,
) -> np.ndarray:
    """End-to-end helper mirroring the reference call site
    (audio_generation_scripts.py:686-697): two mel panels in → styled mel
    panel (80, spec_take_first) out (RGB mean, like the reference's
    ``torch.mean(generated_spec, dim=1)``)."""
    content = load_specs_as_img(content_mel, spec_take_first)
    style = load_specs_as_img(style_mel, spec_take_first)
    img, _ = run_style_transfer(
        variables, content, style,
        num_steps=num_steps, style_weight=style_weight,
        content_weight=content_weight,
    )
    return np.asarray(jnp.mean(img[0], axis=-1))
