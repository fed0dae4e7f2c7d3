"""1-D waveform diffusion UNet with multi-scale context injection and CFG.

The TPU-native counterpart of the reference's `audio_diffusion_pytorch.UNetV0`
as parameterized at exp/model/diffusion.yaml:11-33:
  * per-level channel-concat injection of the onset-encoder pyramid
    (``context_channels``),
  * self-attention only at the deep levels (seq len ≤ 2048 after ≥128×
    downsampling),
  * cross-attention to a single CLAP token at every level,
  * classifier-free guidance via a learned "fixed" (unconditional)
    embedding (``use_embedding_cfg``, embedding_max_length=1).

This is a re-design, not a weight-level clone of a-unet: skip connections
are one per level (concat), down/upsampling is strided/transposed conv with
kernel 2·factor, and FiLM time modulation lives inside each resnet block.
The config surface (channels/factors/items/attentions/cross_attentions/
context_channels/embedding_*) is identical so reference experiment YAMLs
drive it unchanged.

Layout: waveforms are ``(batch, length, channels)``; `sigma` is ``(batch,)``
in [0, 1].
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from syncfusion_tpu.models.blocks import (
    CrossAttention1d,
    Downsample1d,
    FourierTimeEmbedding,
    ResnetBlock1d,
    SelfAttention1d,
    Upsample1d,
)


class UNet1d(nn.Module):
    in_channels: int = 1
    channels: Sequence[int] = (8, 32, 64, 128, 256, 512, 1024, 1024)
    factors: Sequence[int] = (1, 4, 4, 4, 2, 2, 2, 2)
    items: Sequence[int] = (1, 2, 2, 2, 2, 2, 2, 4)
    attentions: Sequence[int] = (0, 0, 0, 0, 1, 1, 1, 1)
    cross_attentions: Sequence[int] = (1, 1, 1, 1, 1, 1, 1, 1)
    context_channels: Sequence[int] = (2, 8, 16, 32, 64, 128, 256, 256)
    attention_heads: int = 8
    attention_features: int = 64
    embedding_features: int = 512
    embedding_max_length: int = 1
    use_embedding_cfg: bool = True
    modulation_features: int = 1024
    resnet_groups: int = 8
    out_channels: Optional[int] = None
    remat: bool = False  # jax.checkpoint each resnet block (memory ↓, FLOPs ↑)
    fused_resnet: bool = False  # Pallas-fused GN/FiLM/SiLU/conv chain
    flash_attention: bool = False  # Pallas flash attention (TPU; has VJP)
    # folded-execution option: Pallas convs that emit their output's group
    # stats so the next GN never re-reads HBM (ops/fused_resblock.py)
    fused_stats: bool = False
    fused_block_l: int = 4096
    dtype: jnp.dtype = jnp.float32

    def _attn(self, name: str) -> SelfAttention1d:
        return SelfAttention1d(
            heads=self.attention_heads,
            head_features=self.attention_features,
            use_flash=self.flash_attention,
            dtype=self.dtype,
            name=name,
        )

    def _xattn(self, name: str) -> CrossAttention1d:
        return CrossAttention1d(
            heads=self.attention_heads,
            head_features=self.attention_features,
            dtype=self.dtype,
            name=name,
        )

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
        n_levels = len(self.channels)
        context = list(context) if context is not None else []
        context += [None] * (n_levels - len(context))

        # --- conditioning ------------------------------------------------
        time_emb = FourierTimeEmbedding(self.modulation_features, name="time_emb")(
            sigma.astype(jnp.float32)
        )

        if self.use_embedding_cfg:
            fixed = self.param(
                "fixed_embedding",
                nn.initializers.normal(1.0),
                (self.embedding_max_length, self.embedding_features),
            )
            fixed = jnp.broadcast_to(fixed[None], (x.shape[0], *fixed.shape))
            if embedding is None:
                embedding = fixed
            elif embedding_cfg_mask is not None:
                # Deterministic mask (sampling-time batched CFG: mask=1 rows
                # use the fixed/unconditional embedding).
                embedding = jnp.where(embedding_cfg_mask.astype(bool), fixed, embedding)
            elif embedding_mask_proba > 0.0:
                # Per-sample CFG dropout (reference semantics: batch_mask
                # replaces the embedding with the fixed one).
                mask = jax.random.bernoulli(
                    self.make_rng("cfg"), embedding_mask_proba, (x.shape[0], 1, 1)
                )
                embedding = jnp.where(mask, fixed, embedding)

        block_cls = nn.remat(ResnetBlock1d) if self.remat else ResnetBlock1d

        def run_items(h, level, path):
            for j in range(self.items[level]):
                h = block_cls(
                    self.channels[level],
                    groups=self.resnet_groups,
                    fused=self.fused_resnet,
                    fused_block_l=self.fused_block_l,
                    dtype=self.dtype,
                    name=f"{path}_res_{level}_{j}",
                )(h, time_emb)
            if self.attentions[level]:
                h = self._attn(f"{path}_attn_{level}")(h)
            if self.cross_attentions[level] and embedding is not None:
                h = self._xattn(f"{path}_xattn_{level}")(h, embedding)
            return h

        # --- down path ----------------------------------------------------
        h = x.astype(self.dtype)
        skips = []
        for i in range(n_levels):
            h = Downsample1d(self.channels[i], self.factors[i], dtype=self.dtype,
                             name=f"down_{i}")(h)
            ctx = context[i]
            if ctx is not None and self.context_channels[i]:
                h = jnp.concatenate([h, ctx.astype(h.dtype)], axis=-1)
            h = run_items(h, i, "down")
            skips.append(h)

        # --- bottleneck -----------------------------------------------------
        mid_ch = self.channels[-1]
        h = ResnetBlock1d(mid_ch, groups=self.resnet_groups, dtype=self.dtype,
                          name="mid_res_0")(h, time_emb)
        h = self._attn("mid_attn")(h)
        if embedding is not None:
            h = self._xattn("mid_xattn")(h, embedding)
        h = ResnetBlock1d(mid_ch, groups=self.resnet_groups, dtype=self.dtype,
                          name="mid_res_1")(h, time_emb)

        # --- up path --------------------------------------------------------
        for i in reversed(range(n_levels)):
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = run_items(h, i, "up")
            up_ch = self.channels[i - 1] if i > 0 else self.channels[0]
            h = Upsample1d(up_ch, self.factors[i], dtype=self.dtype,
                           name=f"up_{i}")(h)

        # --- head -------------------------------------------------------------
        h = nn.GroupNorm(num_groups=min(self.resnet_groups, self.channels[0]),
                         dtype=self.dtype)(h)
        h = nn.silu(h)
        out = nn.Conv(self.out_channels or self.in_channels, (3,),
                      dtype=self.dtype, name="head")(h)
        return out.astype(jnp.float32)
