"""Weight-compatible JAX twins of the reference's diffusion nets.

``UNetV0Compat`` / ``Encoder1dCompat`` mirror, parameter for parameter, the
torch reconstruction in models/adp_torch_recon.py of the reference's
``audio_diffusion_pytorch.UNetV0`` (0.1.3, a-unet XUNet + plugins) and
``audio_encoders_pytorch.Encoder1d`` (0.0.22), as configured at
/root/reference/exp/model/diffusion.yaml:11-43.  Together with
models/adp_convert.py they make the reference's published checkpoint
(``epoch=784-valid_loss=0.008.ckpt``, loaded by the reference at
main/generation.py:40-43) ingestible by ``script/evaluate_diffusion.py``.

They expose the SAME call contract as the TPU-first ``UNet1d`` /
``Encoder1d`` (models/unet1d.py, models/encoder1d.py), so
``SyncFusionDiffusion`` and the v-diffusion loss/sampler
(models/diffusion.py) drive either family unchanged:

  unet(x, sigma, context=..., embedding=..., embedding_cfg_mask=...,
       embedding_mask_proba=...)        x: (B, L, C) float32
  encoder(x, with_info=True) → (out, {"xs": [...]})   xs[2:-1] = context

TPU notes: layout is NLC throughout (channel-last for the MXU); the
sampling loop stays the single-scan CFG-batched path of models/diffusion.py;
the single-CLAP-token cross-attention shortcut (softmax over one key ≡ 1)
is applied here too — numerically exact, skips the 262144-position query
projection at the shallow levels.

The structural decision log (D1-D11) lives in adp_torch_recon.py and
docs/AUNET_MANIFEST.md; torch GroupNorm/LayerNorm eps (1e-5) is pinned.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from syncfusion_tpu.models.adp_torch_recon import Encoder1dConfig, UNetV0Config

_EPS = 1e-5  # torch GroupNorm/LayerNorm default


def _conv_transpose_torch(x, kernel, bias, stride: int):
    """torch ConvTranspose1d (padding 0) on NLC input; kernel (K, I, O)."""
    k = kernel.shape[0]
    return jax.lax.conv_general_dilated(
        x, jnp.flip(kernel, 0),
        window_strides=(1,), padding=[(k - 1, k - 1)], lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + bias


class _Resnet(nn.Module):
    channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = min(self.groups, self.channels)
        h = nn.GroupNorm(num_groups=g, epsilon=_EPS, name="gn1")(x)
        h = nn.Conv(self.channels, (3,), padding=[(1, 1)], dtype=self.dtype,
                    name="conv1")(nn.silu(h))
        h = nn.GroupNorm(num_groups=g, epsilon=_EPS, name="gn2")(h)
        h = nn.Conv(self.channels, (3,), padding=[(1, 1)], dtype=self.dtype,
                    name="conv2")(nn.silu(h))
        return h + x


class _Modulation(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, features):
        scale_shift = nn.Dense(self.channels * 2, dtype=self.dtype,
                               name="to_scale_shift")(nn.silu(features))
        scale, shift = jnp.split(scale_shift[:, None, :], 2, axis=-1)
        h = nn.GroupNorm(num_groups=1, epsilon=_EPS, name="norm")(x)
        return h * (1.0 + scale) + shift


class _Attention(nn.Module):
    """Pre-LN attention, residual inside (a-unet Attention, D8).

    ``context=None`` → self-attention (context = x, but normed by the
    separate ``norm_context`` parameters, matching the torch recon).
    """

    channels: int
    heads: int
    head_features: int
    context_features: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        mid = self.heads * self.head_features
        ctx = x if context is None else context
        ctx_n = nn.LayerNorm(epsilon=_EPS, name="norm_context")(ctx)
        kv = nn.Dense(mid * 2, use_bias=False, dtype=self.dtype, name="to_kv")(ctx_n)
        k, v = jnp.split(kv, 2, axis=-1)

        if ctx.shape[1] == 1:
            # single context token: softmax over one key ≡ 1 → output is
            # to_out(v) independent of q (exact).  q/norm params must still
            # exist for weight conversion: materialize them on a 1-token
            # slice; XLA dead-code-eliminates the unused compute.
            xq = nn.LayerNorm(epsilon=_EPS, name="norm")(x[:, :1])
            _ = nn.Dense(mid, use_bias=False, dtype=self.dtype, name="to_q")(xq)
            o = jnp.broadcast_to(v, (x.shape[0], x.shape[1], mid))
        else:
            xq = nn.LayerNorm(epsilon=_EPS, name="norm")(x)
            q = nn.Dense(mid, use_bias=False, dtype=self.dtype, name="to_q")(xq)
            B, L = q.shape[0], q.shape[1]
            m = k.shape[1]
            qh = q.reshape(B, L, self.heads, self.head_features)
            kh = k.reshape(B, m, self.heads, self.head_features)
            vh = v.reshape(B, m, self.heads, self.head_features)
            o = jax.nn.dot_product_attention(qh, kh, vh).reshape(B, L, mid)
        return x + nn.Dense(self.channels, dtype=self.dtype, name="to_out")(o)


class _Inject(nn.Module):
    channels: int
    ctx_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx):
        h = jnp.concatenate([x, ctx.astype(x.dtype)], axis=-1)
        return nn.Conv(self.channels, (1,), dtype=self.dtype, name="conv")(h)


class _MergeCat(nn.Module):
    channels: int
    skip_scale: float
    cat_order: str = "skip_first"  # D4 runtime switch (see adp_torch_recon)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, skip, x):
        pair = [skip * self.skip_scale, x]
        if self.cat_order == "x_first":
            pair = pair[::-1]
        h = jnp.concatenate(pair, axis=-1)
        return nn.Conv(self.channels, (1,), dtype=self.dtype, name="conv")(h)


class _Block(nn.Module):
    """One XUNet level: downsample → items↓(skip stack) → inner →
    [merge+item]↑ → upsample (decisions D4/D10)."""

    cfg: UNetV0Config
    level: int
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def _item(self, kind: str, j: int, path: str):
        cfg, ch = self.cfg, self.cfg.channels[self.level]
        name = f"items_{path}_{j}"
        if kind == "res":
            cls = nn.remat(_Resnet) if self.remat else _Resnet
            return cls(ch, cfg.resnet_groups, dtype=self.dtype, name=name)
        if kind == "mod":
            return _Modulation(ch, dtype=self.dtype, name=name)
        if kind == "inj":
            return _Inject(ch, cfg.context_channels[self.level],
                           dtype=self.dtype, name=name)
        if kind == "attn":
            return _Attention(ch, cfg.attention_heads, cfg.attention_features,
                              dtype=self.dtype, name=name)
        return _Attention(ch, cfg.attention_heads, cfg.attention_features,
                          context_features=cfg.embedding_features,
                          dtype=self.dtype, name=name)

    def _apply_item(self, kind, item, x, features, embedding, context):
        if kind == "mod":
            return item(x, features)
        if kind == "inj":
            ctx = (context[self.level]
                   if context is not None and len(context) > self.level
                   else None)
            return x if ctx is None else item(x, ctx)
        if kind == "xattn":
            return item(x, embedding)
        if kind == "attn":
            return item(x)
        return item(x)

    @nn.compact
    def __call__(self, x, features, embedding, context):
        cfg, lvl = self.cfg, self.level
        ch, f = cfg.channels[lvl], cfg.factors[lvl]
        n = len(cfg.channels)
        in_ch = cfg.in_channels if lvl == 0 else cfg.channels[lvl - 1]
        out_ch = (cfg.out_channels or cfg.in_channels) if lvl == 0 else in_ch
        kinds = cfg.item_kinds(lvl)

        x = nn.Conv(ch, (f,), strides=(f,), padding="VALID", dtype=self.dtype,
                    name="downsample")(x)
        skips = []
        for j, kind in enumerate(kinds):
            x = self._apply_item(kind, self._item(kind, j, "down"), x,
                                 features, embedding, context)
            skips.append(x)
        if lvl + 1 < n:
            x = _Block(cfg, lvl + 1, remat=self.remat, dtype=self.dtype,
                       name="inner")(x, features, embedding, context)
            for j, kind in enumerate(kinds):
                merge = _MergeCat(ch, cfg.skip_scale,
                                  cat_order=getattr(cfg, "cat_order", "skip_first"),
                                  dtype=self.dtype,
                                  name=f"skip_adapters_{j}")
                x = merge(skips[len(skips) - 1 - j], x)
                x = self._apply_item(kind, self._item(kind, j, "up"), x,
                                     features, embedding, context)
        else:
            for j, kind in enumerate(kinds):
                x = self._apply_item(kind, self._item(kind, j, "up"), x,
                                     features, embedding, context)

        up_kernel = self.param(
            "upsample_kernel", nn.initializers.lecun_normal(), (f, ch, out_ch)
        )
        up_bias = self.param("upsample_bias", nn.initializers.zeros, (out_ch,))
        return _conv_transpose_torch(x, up_kernel.astype(self.dtype), up_bias, f)


class UNetV0Compat(nn.Module):
    """audio-diffusion-pytorch 0.1.3 UNetV0, weight-compatible (NLC layout).

    Same call signature as models/unet1d.UNet1d so SyncFusionDiffusion and
    the v-diffusion loss/sampler drive it unchanged.  ``sigma`` is the
    diffusion time in [0, 1] (the reference's VDiffusion passes uniform
    sigmas; the plugin embeds them with NumberEmbedder + 2-layer GELU MLP).
    """

    cfg: UNetV0Config = UNetV0Config()
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    # convenience accessors used by SyncFusionDiffusion
    @property
    def in_channels(self) -> int:
        return self.cfg.in_channels

    @property
    def embedding_max_length(self) -> int:
        return self.cfg.embedding_max_length

    @property
    def embedding_features(self) -> int:
        return self.cfg.embedding_features

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        sigma: jax.Array,
        *,
        context: Optional[Sequence[Optional[jax.Array]]] = None,
        embedding: Optional[jax.Array] = None,
        embedding_mask_proba: float = 0.0,
        embedding_cfg_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.cfg

        # --- NumberEmbedder + time MLP (D3) -------------------------------
        w = self.param("embedder_weights", nn.initializers.normal(1.0),
                       (cfg.fourier_dim // 2,))
        t = sigma.astype(jnp.float32)[:, None]
        angles = t * w[None, :] * (2.0 * math.pi)
        fourier = jnp.concatenate([t, jnp.sin(angles), jnp.cos(angles)], axis=-1)
        features = nn.Dense(cfg.modulation_features, name="embedder_to_out")(fourier)
        features = nn.gelu(features, approximate=False)
        for i in (0, 1):
            features = nn.Dense(cfg.modulation_features, name=f"mlp_{i}")(features)
            features = nn.gelu(features, approximate=False)

        # --- CFG fixed embedding (ClassifierFreeGuidancePlugin) -----------
        if cfg.use_embedding_cfg:
            fixed = self.param(
                "fixed_embedding", nn.initializers.normal(1.0),
                (cfg.embedding_max_length, cfg.embedding_features),
            )
            bfixed = jnp.broadcast_to(fixed[None], (x.shape[0], *fixed.shape))
            if embedding is None:
                embedding = bfixed
            elif embedding_cfg_mask is not None:
                embedding = jnp.where(
                    embedding_cfg_mask.astype(bool), bfixed, embedding
                )
            elif embedding_mask_proba > 0.0:
                mask = jax.random.bernoulli(
                    self.make_rng("cfg"), embedding_mask_proba, (x.shape[0], 1, 1)
                )
                embedding = jnp.where(mask, bfixed, embedding)

        context = list(context) if context is not None else []
        h = _Block(cfg, 0, remat=self.remat, dtype=self.dtype, name="net")(
            x.astype(self.dtype), features, embedding, context
        )
        return h.astype(jnp.float32)


class Encoder1dCompat(nn.Module):
    """audio-encoders-pytorch 0.0.22 Encoder1d, weight-compatible (NLC).

    Same contract as models/encoder1d.Encoder1d: ``with_info=True`` returns
    ``(out, {"xs": [input, to_in(x), block_0(x), ...]})`` and ``xs[2:-1]``
    is the UNet context pyramid (reference main/module_diffusion.py:76-77).
    """

    cfg: Encoder1dConfig = Encoder1dConfig()
    dtype: jnp.dtype = jnp.float32

    @property
    def in_channels(self) -> int:
        return self.cfg.in_channels

    @nn.compact
    def __call__(self, x: jax.Array, with_info: bool = False):
        cfg = self.cfg
        chs = [cfg.channels * m for m in cfg.multipliers]
        xs = [x]

        # Patcher: ConvBlock1d(GN(1)→SiLU→Conv k3) + patch rearrange (D11)
        h = nn.GroupNorm(num_groups=1, epsilon=_EPS, name="to_in_gn")(x)
        h = nn.Conv(chs[0] // cfg.patch_size, (3,), padding=[(1, 1)],
                    dtype=self.dtype, name="to_in_conv")(nn.silu(h))
        if cfg.patch_size > 1:
            b, l, c = h.shape
            p = cfg.patch_size
            h = h.reshape(b, l // p, p, c).transpose(0, 1, 3, 2).reshape(
                b, l // p, c * p)
        xs.append(h)

        for i, f in enumerate(cfg.factors):
            oc = chs[i + 1]
            h = nn.Conv(oc, (f * 2 + 1,), strides=(f,), padding=[(f, f)],
                        dtype=self.dtype, name=f"ds{i}_down")(h)
            for j in range(cfg.num_blocks[i]):
                g = min(cfg.resnet_groups, oc)
                r = h
                b1 = nn.GroupNorm(num_groups=g, epsilon=_EPS,
                                  name=f"ds{i}_b{j}_gn1")(h)
                b1 = nn.Conv(oc, (3,), padding=[(1, 1)], dtype=self.dtype,
                             name=f"ds{i}_b{j}_conv1")(nn.silu(b1))
                b2 = nn.GroupNorm(num_groups=g, epsilon=_EPS,
                                  name=f"ds{i}_b{j}_gn2")(b1)
                b2 = nn.Conv(oc, (3,), padding=[(1, 1)], dtype=self.dtype,
                             name=f"ds{i}_b{j}_conv2")(nn.silu(b2))
                h = b2 + r  # in==out per config → no shortcut conv
            xs.append(h)

        if with_info:
            return h, {"xs": xs}
        return h

    def context_channels(self) -> list:
        chans = [self.cfg.channels * m for m in self.cfg.multipliers[1:]]
        return chans[:-1]
