"""PatchGAN discriminator (reference specvqgan/modules/discriminator/model.py
NLayerDiscriminator: ndf=64, 3 layers, k4 convs, BatchNorm, LeakyReLU 0.2;
optional ActNorm alternative normalization, model.py:14-46)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class ActNorm(nn.Module):
    """Per-channel affine with data-dependent init (Glow-style): on the
    first training batch, loc/scale are set so outputs are zero-mean,
    unit-variance per channel (reference discriminator/model.py ActNorm)."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        loc = self.param("loc", lambda k: jnp.zeros((c,)))
        scale = self.param("scale", lambda k: jnp.ones((c,)))
        initialized = self.variable("batch_stats", "initialized",
                                    lambda: jnp.zeros((), jnp.bool_))
        if train and not self.is_initializing():
            mean = jnp.mean(x, axis=tuple(range(x.ndim - 1)))
            std = jnp.std(x, axis=tuple(range(x.ndim - 1))) + 1e-6
            do_init = jnp.logical_not(initialized.value)
            loc = jnp.where(do_init, -mean, loc)
            scale = jnp.where(do_init, 1.0 / std, scale)
            initialized.value = jnp.ones((), jnp.bool_)
        return (x + loc) * scale


class NLayerDiscriminator(nn.Module):
    input_nc: int = 1
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False

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
            if self.use_actnorm:
                h = ActNorm(name=f"an{n}")(h, train)
            else:
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=f"bn{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)), name="conv_out")(h)
