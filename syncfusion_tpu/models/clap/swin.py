"""Swin-Transformer blocks (Flax) for the HTSAT audio tower.

Standard Swin v1 semantics: windowed multi-head self-attention with learned
relative-position bias, alternating shifted windows, patch merging between
stages.  Written against fixed square inputs (HTSAT uses 256×256 with
window 8), so every reshape is static — XLA-friendly with no padding or
masking beyond the shifted-window attention mask.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) → (B·nW, ws·ws, C)"""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws², ws²)


def shifted_window_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask for SW-MSA: -100 where tokens come from different
    pre-shift windows."""
    img = np.zeros((1, h, w, 1))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    win = img.reshape(1, h // ws, ws, w // ws, ws, 1)
    win = win.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)  # (nW, ws², ws²)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None) -> jax.Array:
        b_, n, c = x.shape
        ws, nh = self.window_size, self.num_heads
        head_dim = c // nh
        scale = head_dim ** -0.5

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, nh, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = q @ k.transpose(0, 1, 3, 2)  # (B_, nh, n, n)

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, nh),
        )
        idx = jnp.asarray(relative_position_index(ws).reshape(-1))
        bias = bias_table[idx].reshape(n, n, nh).transpose(2, 0, 1)
        attn = attn + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + mask[None, :, None]
            attn = attn.reshape(-1, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    input_resolution: int
    num_heads: int
    window_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = w = self.input_resolution
        ws = min(self.window_size, h)
        shift = 0 if ws >= h else self.shift_size
        b, l, c = x.shape

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x).reshape(b, h, w, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shifted_window_mask(h, w, ws, shift))
        else:
            mask = None
        windows = window_partition(x, ws)
        attn_out = WindowAttention(
            self.dim, ws, self.num_heads, name="attn"
        )(windows, mask)
        x = window_reverse(attn_out, ws, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x.reshape(b, l, c)

        h2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h2 = nn.Dense(int(c * self.mlp_ratio), name="mlp_fc1")(h2)
        h2 = nn.gelu(h2, approximate=False)
        h2 = nn.Dense(c, name="mlp_fc2")(h2)
        return x + h2


class PatchMerging(nn.Module):
    input_resolution: int
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = w = self.input_resolution
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        ).reshape(b, (h // 2) * (w // 2), 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinStage(nn.Module):
    dim: int
    input_resolution: int
    depth: int
    num_heads: int
    window_size: int = 8
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.depth):
            x = SwinBlock(
                dim=self.dim,
                input_resolution=self.input_resolution,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                name=f"blocks_{i}",
            )(x)
        if self.downsample:
            x = PatchMerging(self.input_resolution, self.dim, name="downsample")(x)
        return x
