"""MelGAN vocoder generator (mel 80 → 22.05 kHz waveform).

Behavioral port of the reference's vendored vocoder
(CondFoleyGen/specvqgan/models/vocoder_melgan.py, vggsound checkpoint with
ngf=32, n_residual_layers=3, ratios (8,8,2,2) per melgan_ckpt/args.yml):
7-wide input conv → 4 transposed-conv upsample stages (×8,8,2,2 = 256×
hop) each followed by 3 dilated resnet blocks (dilation 3^j) → tanh head.

Weight-norm is folded into plain kernels at conversion time
(``convert_melgan``) — inference needs no reparameterization.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _conv_transpose_torch(x, kernel, bias, stride: int, padding: int,
                          output_padding: int):
    """torch ConvTranspose1d semantics; kernel (K, O, I) flax layout...

    Implemented as an input-dilated conv with the spatially-flipped kernel:
    out = conv(dilate(x, stride), flip(K), pad = K−1−padding each side,
    +output_padding right).
    """
    k = kernel.shape[0]  # kernel layout (K, I, O)
    pad = (k - 1 - padding, k - 1 - padding + output_padding)
    return jax.lax.conv_general_dilated(
        x, jnp.flip(kernel, 0),
        window_strides=(1,), padding=[pad], lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + bias


class MelGANResnetBlock(nn.Module):
    dim: int
    dilation: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.leaky_relu(x, 0.2)
        h = jnp.pad(h, ((0, 0), (self.dilation, self.dilation), (0, 0)), mode="reflect")
        h = nn.Conv(self.dim, (3,), padding="VALID", kernel_dilation=(self.dilation,),
                    name="conv_dilated")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.dim, (1,), name="conv_1x1")(h)
        shortcut = nn.Conv(self.dim, (1,), name="shortcut")(x)
        return shortcut + h


class MelGANGenerator(nn.Module):
    n_mels: int = 80
    ngf: int = 32
    n_residual_layers: int = 3
    ratios: Sequence[int] = (8, 8, 2, 2)

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        """mel (B, frames, 80) → waveform (B, 256·frames)."""
        mult = 2 ** len(self.ratios)
        x = jnp.pad(mel, ((0, 0), (3, 3), (0, 0)), mode="reflect")
        x = nn.Conv(mult * self.ngf, (7,), padding="VALID", name="conv_in")(x)

        for i, r in enumerate(self.ratios):
            x = nn.leaky_relu(x, 0.2)
            out_ch = mult * self.ngf // 2
            kernel = self.param(
                f"up_{i}_kernel", nn.initializers.lecun_normal(),
                (2 * r, x.shape[-1], out_ch),
            )
            bias = self.param(f"up_{i}_bias", nn.initializers.zeros, (out_ch,))
            x = _conv_transpose_torch(
                x, kernel, bias, stride=r, padding=r // 2 + r % 2,
                output_padding=r % 2,
            )
            for j in range(self.n_residual_layers):
                x = MelGANResnetBlock(out_ch, 3 ** j, name=f"res_{i}_{j}")(x)
            mult //= 2

        x = nn.leaky_relu(x, 0.2)
        x = jnp.pad(x, ((0, 0), (3, 3), (0, 0)), mode="reflect")
        x = nn.Conv(1, (7,), padding="VALID", name="conv_out")(x)
        return jnp.tanh(x)[..., 0]


def fold_weight_norm(v: np.ndarray, g: np.ndarray) -> np.ndarray:
    """weight_norm: w = g · v/‖v‖ with the norm over all dims but dim 0."""
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g.reshape(-1, *([1] * (v.ndim - 1))) * v / np.maximum(norm, 1e-12)


def convert_melgan(state_dict: dict) -> dict:
    """Map the reference MelGAN ``best_netG.pt`` (weight-normed
    ``model.{i}`` Sequential) onto :class:`MelGANGenerator`.

    torch layout: model.1 conv_in(k7), then per ratio i at Sequential index
    3+7i: up conv-transpose, followed by 3 resblocks (each with
    block.{2: dilated conv, 4: 1x1} and shortcut), final conv at the end.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def wn(key):  # folded weight-norm kernel
        return fold_weight_norm(sd[f"{key}.weight_v"], sd[f"{key}.weight_g"])

    def conv(key):  # torch (O, I, K) → flax (K, I, O)
        return {
            "kernel": np.transpose(wn(key), (2, 1, 0)),
            "bias": sd[f"{key}.bias"],
        }

    params: dict = {"conv_in": conv("model.1")}
    ratios = (8, 8, 2, 2)
    idx = 3  # model.0 pad, model.1 conv, model.2 lrelu, model.3 first up
    for i, _ in enumerate(ratios):
        # ConvTranspose1d torch weight (I, O, K) → ours (K, I, O)
        w = wn(f"model.{idx}")
        params[f"up_{i}_kernel"] = np.transpose(w, (2, 0, 1))
        params[f"up_{i}_bias"] = sd[f"model.{idx}.bias"]
        for j in range(3):
            blk = f"model.{idx + 1 + j}"
            params[f"res_{i}_{j}"] = {
                "conv_dilated": conv(f"{blk}.block.2"),
                "conv_1x1": conv(f"{blk}.block.4"),
                "shortcut": conv(f"{blk}.shortcut"),
            }
        idx += 1 + 3 + 1  # up + 3 res + lrelu
    params["conv_out"] = conv(f"model.{idx + 1}")
    return {"params": params}


class Vocoder:
    """Inference facade: spectrogram in the SpecVQGAN [0,1] domain → wav."""

    def __init__(self, checkpoint_path: str | None = None):
        self.net = MelGANGenerator()
        if checkpoint_path:
            from syncfusion_tpu.core.checkpoint import load_torch_state_dict

            self.variables = convert_melgan(load_torch_state_dict(checkpoint_path))
        else:
            self.variables = jax.jit(
                lambda: self.net.init(jax.random.key(0), jnp.zeros((1, 160, 80)))
            )()
        self._apply = jax.jit(self.net.apply)

    def __call__(self, mel: np.ndarray) -> np.ndarray:
        """(B, 80, T) mel (SpecVQGAN orientation) → (B, 256·T) wav."""
        mel = jnp.swapaxes(jnp.asarray(mel), 1, 2)
        return np.asarray(self._apply(self.variables, mel))
