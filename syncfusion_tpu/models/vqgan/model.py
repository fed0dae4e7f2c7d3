"""SpecVQGAN model: encoder → quantize → decoder, plus the wav→spec input
transform (reference specvqgan/models/vqgan.py VQModel).

The spectrogram pipeline reproduces the reference chain exactly
(vqgan.py:51-67 + Wave2Spectrogram): 22.05 kHz wav → magnitude STFT
(n_fft 1024, hop 256, power 1) → MelScale(80, 125–7600, HTK scale, slaney
norm) → [0,1] log-scaling chain → trim to 173 frames → center-crop 80×160 →
scale to [−1, 1].
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from syncfusion_tpu.models.vqgan.autoencoder import Decoder2d, Encoder2d
from syncfusion_tpu.models.vqgan.quantize import VectorQuantizer
from syncfusion_tpu.ops.mel import mel_filterbank, specvqgan_scale
from syncfusion_tpu.ops.stft import spectrogram

MEL_NUM = 80
SPEC_CROP_LEN = 160
SPEC_SR = 22050


def wav_to_spec(wav: jax.Array) -> jax.Array:
    """(B, T) 22.05 kHz audio → (B, 80, 160) spectrogram in [-1, 1]."""
    spec = spectrogram(wav, n_fft=1024, hop_length=256, power=1.0)
    fb = jnp.asarray(
        mel_filterbank(SPEC_SR, 1024, MEL_NUM, 125.0, 7600.0,
                       scale="htk", norm="slaney")
    )
    mel = jnp.einsum("mf,bft->bmt", fb, spec)
    x = specvqgan_scale(mel)
    x = x[:, :, :173]  # TrimSpec(173)
    # CenterCrop (80, 160) on (mels, frames)
    t = x.shape[-1]
    start = max(0, (t - SPEC_CROP_LEN) // 2)
    x = x[:, :, start : start + SPEC_CROP_LEN]
    if x.shape[-1] < SPEC_CROP_LEN:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, SPEC_CROP_LEN - x.shape[-1])))
    return 2.0 * x - 1.0


class VQModel(nn.Module):
    embed_dim: int = 256
    n_embed: int = 1024
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (10,)
    resolution: int = 160
    in_channels: int = 1
    z_channels: int = 256
    dropout: float = 0.0

    def setup(self):
        self.encoder = Encoder2d(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, resolution=self.resolution,
            z_channels=self.z_channels, dropout=self.dropout,
        )
        self.decoder = Decoder2d(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, resolution=self.resolution,
            out_ch=self.in_channels, dropout=self.dropout,
        )
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim)
        self.quant_conv = nn.Conv(self.embed_dim, (1, 1))
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1))

    def encode(self, x: jax.Array):
        """(B, 80, 160, 1) → quantized latent (B, 5, 10, embed_dim)."""
        h = self.encoder(x)
        h = self.quant_conv(h)
        return self.quantize(h)

    def decode(self, quant: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(quant))

    def decode_code(self, indices: jax.Array) -> jax.Array:
        codebook = self.quantize.variables["params"]["embedding"]
        return self.decode(codebook[indices])

    def __call__(self, x: jax.Array):
        quant, diff, info = self.encode(x)
        dec = self.decode(quant)
        return dec, diff, info


@dataclasses.dataclass(frozen=True)
class SpecVQGAN:
    """Functional facade: spec transform + jittable encode/decode helpers."""

    model: VQModel = dataclasses.field(default_factory=VQModel)

    def init(self, key: jax.Array) -> dict:
        return jax.jit(
            lambda k: self.model.init(k, jnp.zeros((1, MEL_NUM, SPEC_CROP_LEN, 1)))
        )(key)

    def encode_indices(self, params, spec: jax.Array) -> jax.Array:
        """spec (B, 80, 160, 1) → token grid (B, 5, 10)."""
        _, _, info = self.model.apply(params, spec, method=VQModel.encode)
        return info["indices"]

    def decode_indices(self, params, indices: jax.Array) -> jax.Array:
        codebook = params["params"]["quantize"]["embedding"]
        quant = codebook[indices]
        return self.model.apply(params, quant, method=VQModel.decode)

    def reconstruct(self, params, spec: jax.Array):
        return self.model.apply(params, spec)
