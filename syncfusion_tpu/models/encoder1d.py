"""Onset-track 1-D conv encoder (the reference's `Encoder1d`).

Encodes the binary onset track (1.0 at onset sample indices, 48 kHz) into a
pyramid of feature maps whose intermediate activations become the UNet's
multi-scale context channels (reference: audio_encoders_pytorch.Encoder1d
parameterized at exp/model/diffusion.yaml:35-43, consumed as
``info['xs'][2:-1]`` at main/module_diffusion.py:76-77).

Behavioral contract reproduced exactly:
  * ``xs`` list = ``[input, stem_out, block_0_out, ..., block_{n-1}_out]``.
  * with channels=2, multipliers=[1,1,4,8,16,32,64,128,128] and
    factors=[1,4,4,4,2,2,2,2]: ``xs[2:-1]`` has channel dims
    (2, 8, 16, 32, 64, 128, 256) at lengths (L, L/4, L/16, L/64, L/128,
    L/256, L/512) — exactly matching the UNet's ``context_channels`` and
    per-level lengths for levels 0..6.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from syncfusion_tpu.models.blocks import Downsample1d, ResnetBlock1d


class Encoder1d(nn.Module):
    in_channels: int = 1
    channels: int = 2
    multipliers: Sequence[int] = (1, 1, 4, 8, 16, 32, 64, 128, 128)
    factors: Sequence[int] = (1, 4, 4, 4, 2, 2, 2, 2)
    num_blocks: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2)
    resnet_groups: int = 2
    patch_size: int = 1
    out_channels: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, with_info: bool = False):
        """x: (B, L, in_channels) → final features; optionally (out, info)."""
        assert len(self.factors) == len(self.num_blocks) == len(self.multipliers) - 1
        xs = [x]

        if self.patch_size > 1:
            b, l, c = x.shape
            x = x.reshape(b, l // self.patch_size, c * self.patch_size)
        x = nn.Conv(
            self.channels * self.multipliers[0], (7,), dtype=self.dtype, name="stem"
        )(x)
        xs.append(x)

        for i, (factor, n_blocks) in enumerate(zip(self.factors, self.num_blocks)):
            ch = self.channels * self.multipliers[i + 1]
            x = Downsample1d(ch, factor, dtype=self.dtype, name=f"down_{i}")(x)
            for j in range(n_blocks):
                x = ResnetBlock1d(
                    ch, groups=self.resnet_groups, dtype=self.dtype,
                    name=f"block_{i}_{j}",
                )(x)
            xs.append(x)

        if self.out_channels is not None:
            x = nn.Conv(self.out_channels, (3,), dtype=self.dtype, name="head")(x)
            xs.append(x)

        if with_info:
            return x, {"xs": xs}
        return x

    def context_channels(self) -> list[int]:
        """Channel dims of ``xs[2:-1]`` — what the UNet must be built for."""
        chans = [self.channels * m for m in self.multipliers[1:]]
        return chans[:-1]
