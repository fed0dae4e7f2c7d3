"""Shared Flax building blocks for the 1-D audio models.

Layout convention: all 1-D feature maps are ``(batch, length, channels)``
(NLC) so convolutions and matmuls hit the MXU with the channel dim last.
The reference's torch modules are NCL; converters transpose at the edges.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class FourierTimeEmbedding(nn.Module):
    """sigma (B,) → (B, features) via learned random-Fourier features.

    Mirrors the learned positional embedding + linear head the reference's
    UNet uses for diffusion-time conditioning (audio-diffusion-pytorch
    `TimePositionalEmbedding`, parameterized at exp/model/diffusion.yaml).
    """

    features: int
    fourier_dim: int = 128

    @nn.compact
    def __call__(self, sigma: jax.Array) -> jax.Array:
        freqs = self.param(
            "freqs", nn.initializers.normal(1.0), (self.fourier_dim // 2,)
        )
        angles = 2.0 * jnp.pi * sigma[:, None] * freqs[None, :]
        fourier = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
        h = jnp.concatenate([fourier, sigma[:, None]], axis=-1)
        h = nn.Dense(self.features)(h)
        h = nn.silu(h)
        h = nn.Dense(self.features)(h)
        return h


def _gn_groups(channels: int, groups: int) -> int:
    """Largest group count ≤ ``groups`` that divides ``channels``."""
    g = min(groups, channels)
    while channels % g:
        g -= 1
    return g


class ResnetBlock1d(nn.Module):
    """GN → SiLU → conv(k3) ×2 with residual; optional FiLM time modulation.

    The modulation is the scale/shift FiLM the reference applies per resnet
    item (a-unet ``MappingToScaleShift`` semantics): the time embedding maps
    to ``(1+scale, shift)`` applied after the first GroupNorm.
    """

    channels: int
    groups: int = 8
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, time_emb: Optional[jax.Array] = None) -> jax.Array:
        residual = x
        in_ch = x.shape[-1]  # may differ from channels (context concat)
        h = nn.GroupNorm(num_groups=_gn_groups(in_ch, self.groups))(x)
        if time_emb is not None:
            scale_shift = nn.Dense(2 * in_ch, name="film")(nn.silu(time_emb))
            scale, shift = jnp.split(scale_shift[:, None, :], 2, axis=-1)
            h = h * (1.0 + scale) + shift
        h = nn.silu(h)
        h = nn.Conv(self.channels, (self.kernel,), dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=_gn_groups(self.channels, self.groups))(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (self.kernel,), dtype=self.dtype, name="conv2")(h)
        if residual.shape[-1] != self.channels:
            residual = nn.Conv(self.channels, (1,), use_bias=False, dtype=self.dtype,
                               name="skip_proj")(residual)
        return h + residual


class SelfAttention1d(nn.Module):
    """Pre-norm multi-head self-attention with residual (no FF, matching the
    reference UNet's AttentionItem).  Runs at sequence lengths ≤2048 in this
    model family (attention only after ≥128× downsampling), so plain XLA
    attention is already MXU-bound; a Pallas flash kernel is only needed for
    long-context variants (ops/attention.py)."""

    heads: int = 8
    head_features: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        channels = x.shape[-1]
        inner = self.heads * self.head_features
        h = nn.GroupNorm(num_groups=_gn_groups(channels, 8))(x)
        qkv = nn.DenseGeneral((3, self.heads, self.head_features), axis=-1,
                              dtype=self.dtype, name="qkv")(h)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        o = jax.nn.dot_product_attention(q, k, v)
        o = o.reshape(*x.shape[:-1], inner)
        o = nn.Dense(channels, dtype=self.dtype, name="out")(o)
        return x + o


class CrossAttention1d(nn.Module):
    """Cross-attention from the sequence to embedding tokens, with residual.

    TPU fast path: when the context has a single token (this model always
    conditions on one CLAP token — embedding_max_length=1,
    exp/model/diffusion.yaml:31), softmax over one key is identically 1, so
    the output is ``W_o·W_v·emb`` independent of the queries.  The query
    projection (262144 positions at the top level!) is skipped — numerically
    exact, not an approximation.
    """

    heads: int = 8
    head_features: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        channels = x.shape[-1]
        inner = self.heads * self.head_features
        h = nn.GroupNorm(num_groups=_gn_groups(channels, 8))(x)
        v = nn.DenseGeneral((self.heads, self.head_features), axis=-1,
                            dtype=self.dtype, name="v")(context)

        if context.shape[1] == 1:
            o = jnp.broadcast_to(
                v.reshape(v.shape[0], 1, inner), (*x.shape[:-1], inner)
            )
        else:
            q = nn.DenseGeneral((self.heads, self.head_features), axis=-1,
                                dtype=self.dtype, name="q")(h)
            k = nn.DenseGeneral((self.heads, self.head_features), axis=-1,
                                dtype=self.dtype, name="k")(context)
            o = jax.nn.dot_product_attention(q, k, v)
            o = o.reshape(*x.shape[:-1], inner)
        o = nn.Dense(channels, dtype=self.dtype, name="out")(o)
        return x + o


class Downsample1d(nn.Module):
    """Strided conv downsample by ``factor`` (kernel 2·factor)."""

    channels: int
    factor: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.factor == 1:
            return nn.Conv(self.channels, (3,), dtype=self.dtype)(x)
        return nn.Conv(
            self.channels, (2 * self.factor,), strides=(self.factor,),
            dtype=self.dtype,
        )(x)


class Upsample1d(nn.Module):
    """Transposed-conv upsample by ``factor`` (kernel 2·factor)."""

    channels: int
    factor: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.factor == 1:
            return nn.Conv(self.channels, (3,), dtype=self.dtype)(x)
        return nn.ConvTranspose(
            self.channels, (2 * self.factor,), strides=(self.factor,),
            dtype=self.dtype,
        )(x)
