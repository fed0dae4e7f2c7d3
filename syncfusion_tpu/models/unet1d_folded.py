"""Folded-layout execution of UNet1d — same params, less HBM traffic.

A drop-in ``apply_fn`` for the diffusion loss/sampler that runs the UNet's
shallow narrow-channel levels in channel-major folded space (ops/folded.py):
level ``i`` activations live as ``(B, L_i/f_i, C_i*f_i)`` with lane width
>=128, eliminating the up-to-16x lane-padding bandwidth the plain layout
pays at C=8/32.  Folds are determined by the down/up factor chain so that
every level-boundary conv absorbs the fold change (f_in = f_out * stride for
strided entry convs, f_out = f_in * stride for transposed exit convs) —
steady state has no relayouts; only the per-level context injections fold
once per forward (and the sampler calls ``encode_context`` once per clip,
outside the 150-step scan).

Deep levels (attention-bearing, already lane-wide) reuse the plain flax
modules applied functionally on the same parameter subtrees, so this path is
numerically equivalent to ``UNet1d.apply`` (tested at f32 round-off) and
fully differentiable — usable for both serving and training.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from syncfusion_tpu.models.blocks import (
    CrossAttention1d,
    FourierTimeEmbedding,
    ResnetBlock1d,
    SelfAttention1d,
    _gn_groups,
)
from syncfusion_tpu.models.unet1d import UNet1d
from syncfusion_tpu.ops.folded import (
    expand_conv,
    expand_conv_transpose,
    fold,
    folded_conv3,
    folded_group_norm,
    folded_group_stats,
    folded_stats_affine,
    unfold,
)


def compute_folds(unet: UNet1d, fold_cap: int, length: int) -> list[int]:
    """Per-level fold factors (1 = plain).

    The deepest folded level D is the largest level such that all levels
    0..D are attention-free (cross-attention is fine — the single-token fast
    path is a per-channel constant add), lengths stay divisible, and the
    widest folded array stays within ``fold_cap`` lanes.  The fold chain is
    forced by the factors: f_D = factors[D+1], f_i = f_{i+1} * factors[i+1].
    """
    n = len(unet.channels)
    multi_token = unet.embedding_max_length != 1
    # length at each level: L_j = L_{j-1} // factors[j]
    lengths = []
    level_len = length
    for j in range(n):
        if level_len % unet.factors[j]:
            return [1] * n
        level_len //= unet.factors[j]
        lengths.append(level_len)

    best: list[int] = [1] * n
    for d in range(n - 1):
        if unet.factors[d + 1] == 1:
            continue
        folds = [1] * n
        folds[d] = unet.factors[d + 1]
        for i in range(d - 1, -1, -1):
            folds[i] = folds[i + 1] * unet.factors[i + 1]
        ok = True
        for j in range(d + 1):
            width = max(
                unet.channels[j] + (unet.context_channels[j] or 0),
                2 * unet.channels[j],
            ) * folds[j]
            if (
                unet.attentions[j]
                or (unet.cross_attentions[j] and multi_token)
                or width > fold_cap
                or lengths[j] % folds[j] != 0
            ):
                ok = False
                break
        if ok:
            best = folds
    return best


class _TopLevelRng(nn.Module):
    """Reproduces ``self.make_rng("cfg")`` as called by the top-level UNet1d
    module (same empty module path -> identical derived key), so the folded
    path's CFG dropout draw matches the plain path bit-for-bit."""

    @nn.compact
    def __call__(self):
        return self.make_rng("cfg")


def _film(p, t_silu):
    out = t_silu @ p["kernel"] + p["bias"]
    fs, ft = jnp.split(out, 2, axis=-1)
    return fs, ft


def _folded_resnet_stats(unet, p, h, t_silu, f, channels, in_stats=None):
    """Folded ResnetBlock1d via the producer-side-stats Pallas path
    (ops/fused_resblock.fused_affine_silu_conv_stats): each conv reads its
    input ONCE and emits the group sums the next GroupNorm needs, so the
    separate stats pass over HBM disappears (docs/ROADMAP.md #1).

    ``in_stats``: (sum, sumsq) of ``h`` from the previous item's conv2 —
    ``None`` at chain starts (post-concat inputs), where one XLA reduce
    pays the read the plain path also pays.  Returns ``(out, out_stats)``
    with ``out_stats`` grouped for the NEXT item's GN_0.
    """
    from syncfusion_tpu.ops.fused_resblock import fused_affine_silu_conv_stats

    b, r, _ = h.shape
    in_ch = h.shape[-1] // f
    block_l = min(unet.fused_block_l, r)
    fs, ft = _film(p["film"], t_silu)

    g0 = _gn_groups(in_ch, unet.resnet_groups)
    s0, ss0 = folded_group_stats(h, g0) if in_stats is None else in_stats
    sc0, sh0 = folded_stats_affine(
        s0, ss0, r * (in_ch // g0) * f,
        p["GroupNorm_0"]["scale"], p["GroupNorm_0"]["bias"], g0, f,
        film_scale=fs, film_shift=ft,
    )

    g1 = _gn_groups(channels, unet.resnet_groups)
    c1, s1, ss1 = fused_affine_silu_conv_stats(
        h, sc0, sh0,
        expand_conv(p["conv1"]["kernel"], 1, f).astype(unet.dtype),
        jnp.repeat(p["conv1"]["bias"], f),
        num_groups=g1, block_l=block_l,
    )
    sc1, sh1 = folded_stats_affine(
        s1, ss1, r * (channels // g1) * f,
        p["GroupNorm_1"]["scale"], p["GroupNorm_1"]["bias"], g1, f,
    )

    if in_ch != channels:
        residual = folded_conv3(
            h, expand_conv(p["skip_proj"]["kernel"], 1, f), None, f,
            dtype=unet.dtype,
        )
    else:
        residual = h
    out, s2, ss2 = fused_affine_silu_conv_stats(
        c1, sc1, sh1,
        expand_conv(p["conv2"]["kernel"], 1, f).astype(unet.dtype),
        jnp.repeat(p["conv2"]["bias"], f),
        residual=residual, num_groups=g1, block_l=block_l,
    )
    return out, (s2, ss2)


def _folded_resnet(unet, p, h, t_silu, f, channels):
    """Folded ResnetBlock1d (blocks.py:50) on param subtree ``p``."""
    in_ch = h.shape[-1] // f
    fs, ft = _film(p["film"], t_silu)
    x = folded_group_norm(
        h, p["GroupNorm_0"]["scale"], p["GroupNorm_0"]["bias"],
        _gn_groups(in_ch, unet.resnet_groups), f,
        film_scale=fs, film_shift=ft, out_dtype=unet.dtype,
    )
    x = folded_conv3(
        nn.silu(x), expand_conv(p["conv1"]["kernel"], 1, f),
        p["conv1"]["bias"], f, dtype=unet.dtype,
    )
    x = folded_group_norm(
        x, p["GroupNorm_1"]["scale"], p["GroupNorm_1"]["bias"],
        _gn_groups(channels, unet.resnet_groups), f, out_dtype=unet.dtype,
    )
    x = folded_conv3(
        nn.silu(x), expand_conv(p["conv2"]["kernel"], 1, f),
        p["conv2"]["bias"], f, dtype=unet.dtype,
    )
    if in_ch != channels:
        residual = folded_conv3(
            h, expand_conv(p["skip_proj"]["kernel"], 1, f), None, f,
            dtype=unet.dtype,
        )
    else:
        residual = h
    return x + residual


def _xattn_const(unet, p, embedding):
    """Single-token cross-attention constant (B, C) — blocks.py:185 fast path."""
    dt = unet.dtype
    v = jnp.einsum(
        "be,ehf->bhf", embedding[:, 0, :].astype(dt), p["v"]["kernel"].astype(dt)
    ) + p["v"]["bias"].astype(dt)
    v = v.reshape(v.shape[0], -1)
    return v @ p["out"]["kernel"].astype(dt) + p["out"]["bias"].astype(dt)


def _plain_resnet(unet, p, h, t, channels):
    # Honor the UNet's remat/fused flags so fold_cap doesn't silently drop
    # gradient checkpointing or the fused kernel on the unfolded tail levels.
    block_cls = nn.remat(ResnetBlock1d) if unet.remat else ResnetBlock1d
    mod = block_cls(
        channels, groups=unet.resnet_groups, fused=unet.fused_resnet,
        dtype=unet.dtype,
    )
    return mod.apply({"params": p}, h, t)


def _plain_attn(unet, p, h, flash=None):
    use_flash = unet.flash_attention if flash is None else flash
    mod = SelfAttention1d(
        heads=unet.attention_heads, head_features=unet.attention_features,
        use_flash=use_flash, dtype=unet.dtype,
    )
    return mod.apply({"params": p}, h)


def _plain_xattn(unet, p, h, embedding):
    mod = CrossAttention1d(
        heads=unet.attention_heads, head_features=unet.attention_features,
        dtype=unet.dtype,
    )
    return mod.apply({"params": p}, h, embedding)


def folded_apply(
    unet: UNet1d,
    variables,
    x: jax.Array,
    sigma: jax.Array,
    *,
    context: Optional[Sequence[Optional[jax.Array]]] = None,
    embedding: Optional[jax.Array] = None,
    embedding_mask_proba: float = 0.0,
    embedding_cfg_mask: Optional[jax.Array] = None,
    rngs: Optional[dict] = None,
    fold_cap: int = 256,
    io_folded: bool = False,
    context_folded: bool = False,
    folds: Optional[list[int]] = None,
    flash: Optional[bool] = None,
    deep_split: int = 0,
    deep_cache: Optional[jax.Array] = None,
    return_deep: bool = False,
) -> jax.Array:
    """Drop-in for ``unet.apply(variables, ...)`` with folded shallow levels.

    ``io_folded``: ``x`` arrives already entry-folded and the output is
    returned folded — lets a sampler keep the scan carry in folded layout so
    the narrow (B, L, C_in) array never round-trips HBM per step (pass the
    precomputed ``folds`` too, since the true length can't be derived from a
    folded ``x`` alone).  ``context_folded``: the context pyramid is
    pre-folded by the caller (once per clip, outside the step loop).

    Deep-feature reuse (DeepCache, Ma et al. 2023, arXiv:2312.00858 —
    adjacent diffusion steps change the deep UNet features slowly):
    ``deep_split=S`` splits the network at level S.  With
    ``deep_cache=None`` the full network runs and (when ``return_deep``)
    the up-path feature entering level S-1 — shape
    ``(B, L_{S-1}/f_{S-1}, channels[S-1]*f_{S-1})``, the level-S up
    output — is returned as the cache.  With ``deep_cache`` given, levels
    S..n-1, the bottleneck, and the deep half of the up path are SKIPPED
    and the cached feature is substituted, so a cached call pays only the
    shallow down/up levels + head.  The samplers refresh the cache every
    K steps (``deep_cache_interval`` in models/diffusion.py).
    """
    p = variables["params"]
    n = len(unet.channels)
    if folds is None:
        assert not io_folded, "io_folded requires precomputed folds"
        folds = compute_folds(unet, fold_cap, x.shape[1])
    context = list(context) if context is not None else []
    context += [None] * (n - len(context))

    time_emb = FourierTimeEmbedding(unet.modulation_features).apply(
        {"params": p["time_emb"]}, sigma.astype(jnp.float32)
    )
    t_silu = nn.silu(time_emb)

    if unet.use_embedding_cfg:
        fixed = jnp.broadcast_to(
            p["fixed_embedding"][None],
            (x.shape[0], unet.embedding_max_length, unet.embedding_features),
        )
        if embedding is None:
            embedding = fixed
        elif embedding_cfg_mask is not None:
            embedding = jnp.where(embedding_cfg_mask.astype(bool), fixed, embedding)
        elif embedding_mask_proba > 0.0:
            key = _TopLevelRng().apply({}, rngs={"cfg": rngs["cfg"]})
            mask = jax.random.bernoulli(
                key, embedding_mask_proba, (x.shape[0], 1, 1)
            )
            embedding = jnp.where(mask, fixed, embedding)

    def run_items(h, level, path, f):
        stats = None  # producer-side stats threaded item→item (fused_stats)
        for j in range(unet.items[level]):
            sub = p[f"{path}_res_{level}_{j}"]
            if f > 1 and unet.fused_stats:
                h, stats = _folded_resnet_stats(
                    unet, sub, h, t_silu, f, unet.channels[level], stats
                )
            elif f > 1:
                h = _folded_resnet(unet, sub, h, t_silu, f, unet.channels[level])
            else:
                h = _plain_resnet(unet, sub, h, time_emb, unet.channels[level])
        if unet.attentions[level]:
            h = _plain_attn(unet, p[f"{path}_attn_{level}"], h, flash)
        if unet.cross_attentions[level] and embedding is not None:
            sub = p[f"{path}_xattn_{level}"]
            if f > 1:
                const = _xattn_const(unet, sub, embedding)
                h = h + jnp.repeat(const, f, axis=-1)[:, None, :]
            else:
                h = _plain_xattn(unet, sub, h, embedding)
        return h

    def boundary_conv(sub, h, f_in, f_out, stride, channels, transposed):
        """Level-boundary conv, folded on either side when f_in or f_out > 1."""
        if f_in == 1 and f_out == 1:
            kw = sub["kernel"].shape[0]
            mod = (nn.ConvTranspose if transposed else nn.Conv)(
                channels, (kw,), strides=(stride,), dtype=unet.dtype
            )
            return mod.apply({"params": sub}, h)
        if transposed:
            k_f = expand_conv_transpose(sub["kernel"], stride, f_in)
        else:
            k_f = expand_conv(sub["kernel"], stride, f_out)
        return folded_conv3(h, k_f, sub["bias"], max(f_out, 1), dtype=unet.dtype)

    # --- down path ------------------------------------------------------
    if deep_split and not (1 <= deep_split <= n - 1):
        raise ValueError(f"deep_split must be in [1, {n - 1}], got {deep_split}")
    if deep_cache is not None and not deep_split:
        raise ValueError("deep_cache requires deep_split")
    n_down = deep_split if (deep_split and deep_cache is not None) else n
    h = x.astype(unet.dtype)
    entry_fold = folds[0] * unet.factors[0]
    if entry_fold > 1 and not io_folded:
        h = fold(h, entry_fold)
    skips = []
    for i in range(n_down):
        f_prev = folds[i - 1] if i > 0 else entry_fold
        stride = unet.factors[i]
        kw_key = "Conv_0"
        # Downsample1d uses k=3 s=1 when factor==1, else k=2*factor stride factor
        s_eff = 1 if stride == 1 else stride
        assert f_prev == folds[i] * s_eff or (f_prev == 1 and folds[i] == 1), (
            f"fold chain broken at level {i}: {f_prev} vs {folds[i]}*{s_eff}"
        )
        h = boundary_conv(
            p[f"down_{i}"][kw_key], h, f_prev, folds[i], s_eff,
            unet.channels[i], transposed=False,
        )
        ctx = context[i]
        if ctx is not None and unet.context_channels[i]:
            ctx = ctx.astype(h.dtype)
            if folds[i] > 1 and not context_folded:
                ctx = fold(ctx, folds[i])
            h = jnp.concatenate([h, ctx], axis=-1)
        h = run_items(h, i, "down", folds[i])
        skips.append(h)

    if deep_split and deep_cache is not None:
        # Deep levels skipped: substitute the cached up-path feature at the
        # split point (output of up-level deep_split = input to the
        # up-level deep_split-1 concat).
        h = deep_cache.astype(unet.dtype)
        deep_out = deep_cache
    else:
        # --- bottleneck (never folded: deepest level is attention-bearing)
        h = _plain_resnet(unet, p["mid_res_0"], h, time_emb, unet.channels[-1])
        h = _plain_attn(unet, p["mid_attn"], h, flash)
        if embedding is not None:
            h = _plain_xattn(unet, p["mid_xattn"], h, embedding)
        h = _plain_resnet(unet, p["mid_res_1"], h, time_emb, unet.channels[-1])
        deep_out = None

    # --- up path --------------------------------------------------------
    for i in reversed(range(n_down)):
        h = jnp.concatenate([h, skips[i]], axis=-1)
        h = run_items(h, i, "up", folds[i])
        up_ch = unet.channels[i - 1] if i > 0 else unet.channels[0]
        stride = unet.factors[i]
        f_out = folds[i - 1] if i > 0 else entry_fold
        if stride == 1:
            sub = p[f"up_{i}"]["Conv_0"]
            h = boundary_conv(sub, h, folds[i], f_out, 1, up_ch, transposed=False)
        else:
            sub = p[f"up_{i}"]["ConvTranspose_0"]
            h = boundary_conv(sub, h, folds[i], f_out, stride, up_ch,
                              transposed=True)
        if deep_split and deep_out is None and i == deep_split:
            deep_out = h  # cacheable feature entering up-level deep_split-1

    # --- head -----------------------------------------------------------
    out_ch = unet.out_channels or unet.in_channels
    head_groups = min(unet.resnet_groups, unet.channels[0])
    if entry_fold > 1:
        h = folded_group_norm(
            h, p["GroupNorm_0"]["scale"], p["GroupNorm_0"]["bias"],
            head_groups, entry_fold, out_dtype=unet.dtype,
        )
        h = folded_conv3(
            nn.silu(h), expand_conv(p["head"]["kernel"], 1, entry_fold),
            p["head"]["bias"], entry_fold, dtype=unet.dtype,
        )
        if not io_folded:
            h = unfold(h, entry_fold)
    else:
        h = nn.GroupNorm(num_groups=head_groups, dtype=unet.dtype).apply(
            {"params": p["GroupNorm_0"]}, h
        )
        h = nn.Conv(out_ch, (3,), dtype=unet.dtype).apply(
            {"params": p["head"]}, nn.silu(h)
        )
    out = h.astype(jnp.float32)
    if return_deep:
        assert deep_split, "return_deep requires deep_split"
        return out, deep_out
    return out


def make_folded_apply(unet: UNet1d, fold_cap: int = 256):
    """flax-style ``apply_fn(variables, x, sigma, **kw)`` running folded."""

    def apply_fn(variables, x, sigma, **kwargs):
        return folded_apply(unet, variables, x, sigma, fold_cap=fold_cap, **kwargs)

    return apply_fn
