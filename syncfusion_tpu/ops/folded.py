"""Whole-level folded layout for narrow-channel 1-D feature maps.

TPU HBM/VMEM layouts pad the minor (lane) dimension to 128, so an f32
activation with C=8 channels in the minor dim wastes up to 16x bandwidth —
and the UNet's shallow high-rate levels (262144x8, 65536x32) dominate HBM
traffic, which round-1 profiling showed is the denoise forward's bottleneck
(76% HBM BW, 11% MXU).  This module folds ``f`` consecutive time steps into
the channel dim ONCE at level entry and keeps the whole level's resnet stack
in ``(B, L/f, C*f)`` space, eliminating the padding instead of paying a
relayout per op (per-op folding measurably loses; see ops/fused_resblock.py).

Layout: **channel-major** — folded index ``c*f + k`` holds original
``(l = r*f + k, c)``.  Channel-major makes channel concatenation (context
injection, UNet skips) a plain ``concatenate`` on the folded axis, and keeps
GroupNorm group slices contiguous.

Every conv in the level (k=3 resnet convs, 1x1 skip projections, strided
entry downsamples, transposed exit upsamples) becomes an EXACT width-3 conv
over folded rows whose expanded kernel is derived by **probing the original
flax op on one-hot basis inputs** — the folded kernel is a linear
rearrangement of the original kernel, so probing reproduces the op's exact
semantics (padding rule, kernel orientation, stride phase) with no
hand-derived index math.  Fold/unfold at level boundaries is absorbed into
the entry/exit convs (``f_in != f_out``), so steady state has zero
relayouts.

This is a serving/training fast path over the SAME parameter tree as the
plain UNet1d — numerically equivalent (tested), checkpoints unaffected.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def fold(x: jax.Array, f: int) -> jax.Array:
    """(B, L, C) -> (B, L//f, C*f), channel-major: out[b, r, c*f+k] = x[b, r*f+k, c]."""
    if f == 1:
        return x
    b, l, c = x.shape
    assert l % f == 0, f"length {l} not divisible by fold {f}"
    return x.reshape(b, l // f, f, c).transpose(0, 1, 3, 2).reshape(b, l // f, c * f)


def unfold(x: jax.Array, f: int) -> jax.Array:
    """Inverse of :func:`fold`."""
    if f == 1:
        return x
    b, r, cf = x.shape
    assert cf % f == 0
    c = cf // f
    return x.reshape(b, r, c, f).transpose(0, 1, 3, 2).reshape(b, r * f, c)


def expand_folded_kernel(
    conv_apply: Callable[[jax.Array], jax.Array],
    c_in: int,
    c_out: int,
    f_in: int,
    f_out: int,
) -> jax.Array:
    """Derive the width-3 folded-row kernel equivalent to ``conv_apply``.

    ``conv_apply`` maps (N, L, c_in) -> (N, L * f_out / f_in, c_out) and must
    be linear and banded with receptive field small enough that an output row
    only sees input rows r-1..r+1 (true for every conv in this model: k=3
    s=1, k=2s stride-s, and k=2s transposed stride-s with f_in*s=f_out).

    Returns K_f of shape (3, c_in*f_in, c_out*f_out), channel-major on both
    sides, such that ``conv3_folded(fold(x, f_in), K_f) ==
    fold(conv_apply(x), f_out)`` exactly.  Built by probing on one-hot basis
    inputs — a single batched conv of trivial size, loop-invariant under jit
    (hoisted out of sampler scans by XLA).
    """
    rows = 5
    n = 3 * c_in * f_in
    probe = np.zeros((n, rows * f_in, c_in), np.float32)
    idx = 0
    for d in range(3):           # input row offset D-1 relative to output row
        for ci in range(c_in):
            for k in range(f_in):
                probe[idx, (d + 1) * f_in + k, ci] = 1.0
                idx += 1
    y = conv_apply(jnp.asarray(probe))          # (n, rows*f_out, c_out)
    center = y[:, 2 * f_out : 3 * f_out, :]     # (n, f_out, c_out)
    k_f = center.reshape(3, c_in, f_in, f_out, c_out)
    k_f = k_f.transpose(0, 1, 2, 4, 3).reshape(3, c_in * f_in, c_out * f_out)
    return k_f


def expand_conv(kernel: jax.Array, stride: int, f_out: int) -> jax.Array:
    """Folded kernel for a flax ``nn.Conv`` (SAME padding), f_in = f_out*stride."""
    kw, c_in, c_out = kernel.shape
    mod = nn.Conv(c_out, (kw,), strides=(stride,), use_bias=False)
    return expand_folded_kernel(
        lambda x: mod.apply({"params": {"kernel": kernel}}, x),
        c_in, c_out, f_out * stride, f_out,
    )


def expand_conv_transpose(kernel: jax.Array, stride: int, f_in: int) -> jax.Array:
    """Folded kernel for a flax ``nn.ConvTranspose`` (SAME), f_out = f_in*stride."""
    kw, c_in, c_out = kernel.shape
    mod = nn.ConvTranspose(c_out, (kw,), strides=(stride,), use_bias=False)
    return expand_folded_kernel(
        lambda x: mod.apply({"params": {"kernel": kernel}}, x),
        c_in, c_out, f_in, f_in * stride,
    )


def folded_conv3(
    x_f: jax.Array,
    k_f: jax.Array,
    bias: Optional[jax.Array],
    f_out: int,
    dtype=jnp.float32,
) -> jax.Array:
    """Width-3 conv over folded rows: (B, R, c_in*f_in) -> (B, R, c_out*f_out)."""
    y = jax.lax.conv_general_dilated(
        x_f.astype(dtype),
        k_f.astype(dtype),
        window_strides=(1,),
        padding=((1, 1),),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if bias is not None:
        y = y + jnp.repeat(bias, f_out).astype(dtype)
    return y


def folded_group_norm(
    x_f: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int,
    f: int,
    *,
    film_scale: Optional[jax.Array] = None,
    film_shift: Optional[jax.Array] = None,
    eps: float = 1e-6,
    out_dtype=None,
) -> jax.Array:
    """GroupNorm over a channel-major folded map, optionally fused with FiLM.

    Exact folded equivalent of ``nn.GroupNorm(num_groups)(unfold(x))`` (flax
    semantics: f32 stats, fast variance) followed by the resnet FiLM
    ``h*(1+scale)+shift`` — both per-channel affines are merged into one.
    Group slices stay contiguous in channel-major layout, so stats are plain
    reshaped reductions.  ``film_scale``/``film_shift`` are (B, C).
    """
    b, r, cf = x_f.shape
    c = cf // f
    assert c % num_groups == 0
    x32 = x_f.astype(jnp.float32)
    xg = x32.reshape(b, r, num_groups, (c // num_groups) * f)
    mu = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg), axis=(1, 3), keepdims=True) - jnp.square(mu)
    norm = ((xg - mu) * jax.lax.rsqrt(var + eps)).reshape(b, r, cf)

    scale = jnp.repeat(gamma.astype(jnp.float32), f)[None, None, :]
    shift = jnp.repeat(beta.astype(jnp.float32), f)[None, None, :]
    if film_scale is not None:
        fs = jnp.repeat(1.0 + film_scale.astype(jnp.float32), f, axis=-1)[:, None, :]
        ft = jnp.repeat(film_shift.astype(jnp.float32), f, axis=-1)[:, None, :]
        scale = scale * fs
        shift = shift * fs + ft
    out = norm * scale + shift
    # stats/affine in f32 (flax semantics); emit in the compute dtype so the
    # following silu/conv pass doesn't move f32 activations through HBM
    return out.astype(out_dtype) if out_dtype is not None else out


def folded_group_stats(x_f: jax.Array, num_groups: int) -> tuple[jax.Array, jax.Array]:
    """Per-(batch, group) ``(sum, sumsq)`` of a channel-major folded map —
    the one-XLA-read fallback for chain starts (post-concat inputs) in the
    producer-side-stats resnet path."""
    b, r, cf = x_f.shape
    x32 = x_f.astype(jnp.float32)
    xg = x32.reshape(b, r, num_groups, cf // num_groups)
    return xg.sum(axis=(1, 3)), (xg * xg).sum(axis=(1, 3))


def folded_stats_affine(
    s: jax.Array,
    ss: jax.Array,
    count: int,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int,
    f: int,
    film_scale: Optional[jax.Array] = None,
    film_shift: Optional[jax.Array] = None,
    eps: float = 1e-6,
) -> tuple[jax.Array, jax.Array]:
    """(B, G) sums → per-(batch, folded-channel) affine folding GN γ/β, the
    stats, and optional FiLM into one ``x·scale + shift``.

    The counterpart of :func:`folded_group_norm` when the statistics were
    already produced by the upstream kernel
    (ops/fused_resblock.fused_affine_silu_conv_stats): with
    ``mean = s/count``, ``var = ss/count − mean²``,

        GN(x)·γ(1+fs) + β(1+fs) + ft  ≡  x·scale + shift.

    Returns (scale, shift), each (B, C·f) float32.
    """
    c = gamma.shape[0]
    mean = s / count                                  # (B, G)
    var = ss / count - mean * mean
    inv = jax.lax.rsqrt(var + eps)

    cols = c // num_groups
    inv_c = jnp.repeat(inv, cols, axis=1)             # (B, C)
    mean_c = jnp.repeat(mean, cols, axis=1)
    g32 = gamma.astype(jnp.float32)[None]
    b32 = beta.astype(jnp.float32)[None]

    one_plus = (
        1.0 + film_scale.astype(jnp.float32)
        if film_scale is not None else jnp.ones_like(g32)
    )
    scale = inv_c * g32 * one_plus                    # (B, C)
    shift = (b32 - mean_c * inv_c * g32) * one_plus
    if film_shift is not None:
        shift = shift + film_shift.astype(jnp.float32)
    # expand to folded channel-major layout (channel c occupies cols c·f..c·f+f)
    return (
        jnp.repeat(scale, f, axis=1),
        jnp.repeat(shift, f, axis=1),
    )
