"""PatchGAN discriminator (reference specvqgan/modules/discriminator/model.py
NLayerDiscriminator: ndf=64, 3 layers, k4 convs, BatchNorm, LeakyReLU 0.2)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class NLayerDiscriminator(nn.Module):
    input_nc: int = 1
    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        mult = 1
        for n in range(1, self.n_layers + 1):
            mult = min(2 ** n, 8)
            stride = 2 if n < self.n_layers else 1
            h = nn.Conv(
                self.ndf * mult, (4, 4), strides=(stride, stride),
                padding=((1, 1), (1, 1)), use_bias=False, name=f"conv{n}",
            )(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)), name="conv_out")(h)
