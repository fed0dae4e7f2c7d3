"""taming-style conv encoder/decoder (channels-last, Flax).

Geometry per the reference codebook config
(CondFoleyGen/config/greatesthit_codebook.yaml:55-66): input 80×160×1 mel,
ch=128, ch_mult (1,1,2,2,4) → 4 downsamples → 5×10×z_channels(256) latent,
attention at resolution 10, 2 res-blocks per level.  Blocks follow
specvqgan/modules/diffusionmodules/model.py semantics: GroupNorm(32,
eps 1e-6) + swish, nin (1×1) shortcuts, asymmetric-pad stride-2 downsample,
nearest×2 + conv upsample.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _gn(x_channels: int) -> int:
    return min(32, x_channels)


class ResnetBlock2d(nn.Module):
    out_channels: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=_gn(in_ch), epsilon=1e-6)(x)
        h = nn.swish(h)
        h = nn.Conv(self.out_channels, (3, 3), name="conv1")(h)
        h = nn.GroupNorm(num_groups=_gn(self.out_channels), epsilon=1e-6)(h)
        h = nn.swish(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock2d(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        hn = nn.GroupNorm(num_groups=_gn(c), epsilon=1e-6)(x)
        q = nn.Conv(c, (1, 1), name="q")(hn).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), name="k")(hn).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), name="v")(hn).reshape(b, h * w, c)
        attn = jax.nn.softmax(q @ jnp.swapaxes(k, 1, 2) * (c ** -0.5), axis=-1)
        out = (attn @ v).reshape(b, h, w, c)
        return x + nn.Conv(c, (1, 1), name="proj_out")(out)


class Downsample2d(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # taming: asymmetric (0,1,0,1) pad + stride-2 VALID conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="VALID")(x)


class Upsample2d(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        return nn.Conv(c, (3, 3))(x)


class Encoder2d(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (10,)
    resolution: int = 160
    z_channels: int = 256
    double_z: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = nn.Conv(self.ch, (3, 3), name="conv_in")(x)
        curr_res = self.resolution
        for i, mult in enumerate(self.ch_mult):
            ch = self.ch * mult
            for j in range(self.num_res_blocks):
                h = ResnetBlock2d(ch, self.dropout, name=f"down_{i}_block_{j}")(
                    h, deterministic
                )
                if curr_res in self.attn_resolutions:
                    h = AttnBlock2d(name=f"down_{i}_attn_{j}")(h)
            if i != len(self.ch_mult) - 1:
                h = Downsample2d(name=f"down_{i}_downsample")(h)
                curr_res //= 2

        h = ResnetBlock2d(h.shape[-1], self.dropout, name="mid_block_1")(h, deterministic)
        h = AttnBlock2d(name="mid_attn_1")(h)
        h = ResnetBlock2d(h.shape[-1], self.dropout, name="mid_block_2")(h, deterministic)

        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), epsilon=1e-6, name="norm_out")(h)
        h = nn.swish(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), name="conv_out")(h)


class Decoder2d(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (10,)
    resolution: int = 160
    out_ch: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        n_levels = len(self.ch_mult)
        curr_res = self.resolution // 2 ** (n_levels - 1)
        h = nn.Conv(self.ch * self.ch_mult[-1], (3, 3), name="conv_in")(z)

        h = ResnetBlock2d(h.shape[-1], self.dropout, name="mid_block_1")(h, deterministic)
        h = AttnBlock2d(name="mid_attn_1")(h)
        h = ResnetBlock2d(h.shape[-1], self.dropout, name="mid_block_2")(h, deterministic)

        for i in reversed(range(n_levels)):
            ch = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock2d(ch, self.dropout, name=f"up_{i}_block_{j}")(
                    h, deterministic
                )
                if curr_res in self.attn_resolutions:
                    h = AttnBlock2d(name=f"up_{i}_attn_{j}")(h)
            if i != 0:
                h = Upsample2d(name=f"up_{i}_upsample")(h)
                curr_res *= 2

        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), epsilon=1e-6, name="norm_out")(h)
        h = nn.swish(h)
        return nn.Conv(self.out_ch, (3, 3), name="conv_out")(h)
