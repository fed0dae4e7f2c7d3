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

    ``fused=True`` routes both GN→(FiLM)→SiLU→conv chains through the
    blocked Pallas kernel (ops/fused_resblock.py): GN stats are one cheap
    XLA reduction, the normalize/modulate/activate/convolve chain reads x
    once.  Numerically equivalent (tested); params are identical between
    paths.
    """

    channels: int
    groups: int = 8
    kernel: int = 3
    fused: bool = False
    fused_block_l: int = 4096
    fused_min_ch: int = 32  # narrow-lane tiles lose below this (measured)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, time_emb: Optional[jax.Array] = None) -> jax.Array:
        residual = x
        in_ch = x.shape[-1]  # may differ from channels (context concat)

        # dtype: stats stay f32 (flax), but emit in compute dtype so bf16
        # models don't move f32 activations through HBM between GN and conv
        gn1 = nn.GroupNorm(num_groups=_gn_groups(in_ch, self.groups),
                           dtype=self.dtype, name="GroupNorm_0")
        gn2 = nn.GroupNorm(num_groups=_gn_groups(self.channels, self.groups),
                           dtype=self.dtype, name="GroupNorm_1")
        conv1 = nn.Conv(self.channels, (self.kernel,), dtype=self.dtype, name="conv1")
        conv2 = nn.Conv(self.channels, (self.kernel,), dtype=self.dtype, name="conv2")
        film = (
            nn.Dense(2 * in_ch, name="film") if time_emb is not None else None
        )

        use_fused = (
            self.fused
            and self.kernel == 3
            and x.shape[1] % self.fused_block_l == 0
            and self.fused_min_ch <= in_ch <= 128
            and self.fused_min_ch <= self.channels <= 128
        )
        if use_fused:
            h = self._fused_path(x, time_emb, gn1, gn2, conv1, conv2, film)
        else:
            h = gn1(x)
            if film is not None:
                scale_shift = film(nn.silu(time_emb))
                scale, shift = jnp.split(scale_shift[:, None, :], 2, axis=-1)
                h = h * (1.0 + scale) + shift
            h = nn.silu(h)
            h = conv1(h)
            h = gn2(h)
            h = nn.silu(h)
            h = conv2(h)

        if residual.shape[-1] != self.channels:
            residual = nn.Conv(self.channels, (1,), use_bias=False, dtype=self.dtype,
                               name="skip_proj")(residual)
        return h + residual

    def _fused_path(self, x, time_emb, gn1, gn2, conv1, conv2, film):
        """Shared-params fused chain: params come from the SAME submodules
        (created by calling them on zero-length dummies so the variable tree
        is identical to the plain path), math from ops/fused_resblock."""
        from syncfusion_tpu.ops.fused_resblock import (
            fold_groupnorm_film,
            fused_affine_silu_conv_blocked,
        )

        in_ch = x.shape[-1]
        b = x.shape[0]
        # materialize identical params via dummy calls (traced away by XLA)
        dummy = jnp.zeros((1, 8, in_ch), x.dtype)
        _ = conv1(nn.silu(gn1(dummy)))
        dummy2 = jnp.zeros((1, 8, self.channels), x.dtype)
        _ = conv2(nn.silu(gn2(dummy2)))
        if film is not None:
            film_out = film(nn.silu(time_emb))
            fs, ft = jnp.split(film_out, 2, axis=-1)
        else:
            fs = jnp.zeros((b, in_ch), jnp.float32)
            ft = jnp.zeros((b, in_ch), jnp.float32)

        g1 = _gn_groups(in_ch, self.groups)
        g2 = _gn_groups(self.channels, self.groups)
        p = self.variables["params"]
        scale1, shift1 = fold_groupnorm_film(
            x, p["GroupNorm_0"]["scale"], p["GroupNorm_0"]["bias"],
            fs.astype(jnp.float32), ft.astype(jnp.float32), g1,
        )
        h = fused_affine_silu_conv_blocked(
            x, scale1, shift1,
            p["conv1"]["kernel"].astype(self.dtype), p["conv1"]["bias"],
            block_l=self.fused_block_l,
        )
        zero = jnp.zeros((h.shape[0], self.channels), jnp.float32)
        scale2, shift2 = fold_groupnorm_film(
            h, p["GroupNorm_1"]["scale"], p["GroupNorm_1"]["bias"],
            zero, zero, g2,
        )
        return fused_affine_silu_conv_blocked(
            h, scale2, shift2,
            p["conv2"]["kernel"].astype(self.dtype), p["conv2"]["bias"],
            block_l=self.fused_block_l,
        )


class SelfAttention1d(nn.Module):
    """Pre-norm multi-head self-attention with residual (no FF, matching the
    reference UNet's AttentionItem).

    ``use_flash`` routes through the Pallas flash kernel (ops/attention.py):
    HLO inspection showed XLA attention materializes the f32 (B, H, T, T)
    score tensor — 1.07 GB per call at T=2048/B=8, ~40% of the whole denoise
    forward's HBM traffic — so flash is the serving-path default.  The
    kernel is differentiable (custom VJP with recomputation-based backward,
    ops/attention.py) so training paths may enable it too — same numerics
    up to online-softmax reassociation."""

    heads: int = 8
    head_features: int = 64
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        channels = x.shape[-1]
        inner = self.heads * self.head_features
        h = nn.GroupNorm(num_groups=_gn_groups(channels, 8), dtype=self.dtype)(x)
        qkv = nn.DenseGeneral((3, self.heads, self.head_features), axis=-1,
                              dtype=self.dtype, name="qkv")(h)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        from syncfusion_tpu.ops.attention import (
            DEFAULT_BLOCK_K,
            DEFAULT_BLOCK_Q,
            flash_attention,
        )

        if (
            self.use_flash
            and jax.default_backend() == "tpu"
            and x.shape[1] % max(DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K) == 0
        ):
            o = flash_attention(q, k, v)
        else:
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
        h = nn.GroupNorm(num_groups=_gn_groups(channels, 8), dtype=self.dtype)(x)
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
