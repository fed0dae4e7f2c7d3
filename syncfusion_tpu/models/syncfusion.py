"""SyncFusion diffusion system: UNet + onset encoder + frozen embedder.

The TPU counterpart of the reference's Lightning module
(main/module_diffusion.py:22-87): holds the diffusion UNet and the onsets
`Encoder1d` (both trained), computes CLAP embeddings with a frozen embedder,
and wires the encoder's intermediate activations ``xs[2:-1]`` into the
UNet's per-level context channels.

Everything is a pure function over a parameter pytree
``{"unet": ..., "encoder": ...}`` — frozen embedder params live outside and
never receive gradients (reference freezes CLAP at module_diffusion.py:50-51).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from syncfusion_tpu.models.diffusion import dpm_sample, v_diffusion_loss, v_sample
from syncfusion_tpu.models.encoder1d import Encoder1d
from syncfusion_tpu.models.unet1d import UNet1d


@dataclasses.dataclass(frozen=True)
class SyncFusionDiffusion:
    unet: UNet1d
    onsets_encoder: Encoder1d
    # >0: run the UNet through the folded-layout apply (unet1d_folded.py) with
    # this lane cap — same params, numerically equivalent, less HBM traffic.
    # Ignored for the compat (a-unet weight-compatible) module pair.
    fold_cap: int = 0

    def _unet_apply(self):
        if self.fold_cap and isinstance(self.unet, UNet1d):
            from syncfusion_tpu.models.unet1d_folded import make_folded_apply

            return make_folded_apply(self.unet, self.fold_cap)
        return self.unet.apply

    # ------------------------------------------------------------- setup
    @classmethod
    def from_config(
        cls,
        model_cfg: Optional[dict] = None,
        dtype=jnp.float32,
        compat: Optional[bool] = None,
        fold_cap: Optional[int] = None,
        fused_stats: Optional[bool] = None,
    ):
        """Build from an exp/model/diffusion.yaml-style config node (or the
        reference defaults when None).

        ``compat=True`` (or ``model.compat: true`` in the config) selects the
        weight-compatible a-unet twins (models/adp_compat.py) whose param
        trees load the reference's published torch checkpoints through
        models/adp_convert.py; default is the TPU-first re-design.
        """
        if compat is None:
            compat = bool(model_cfg and model_cfg.get("compat", False))
        if fold_cap is None:
            fold_cap = int(model_cfg.get("fold_cap", 0)) if model_cfg else 0
        if compat:
            from syncfusion_tpu.models.adp_compat import Encoder1dCompat, UNetV0Compat
            from syncfusion_tpu.models.adp_torch_recon import (
                Encoder1dConfig,
                UNetV0Config,
            )

            if model_cfg is None:
                ucfg, ecfg = UNetV0Config(), Encoder1dConfig()
            else:
                ucfg = UNetV0Config.from_node(model_cfg["model"])
                ecfg = Encoder1dConfig.from_node(model_cfg["onsets_encoder"])
            return cls(
                unet=UNetV0Compat(cfg=ucfg, dtype=dtype),
                onsets_encoder=Encoder1dCompat(cfg=ecfg, dtype=dtype),
            )
        if fused_stats is None:
            fused_stats = bool(model_cfg and model_cfg.get("model", {}).get(
                "fused_stats", False))
        if model_cfg is None:
            return cls(
                unet=UNet1d(dtype=dtype, fused_stats=fused_stats),
                onsets_encoder=Encoder1d(dtype=dtype),
                fold_cap=fold_cap,
            )
        m = model_cfg["model"]
        e = model_cfg["onsets_encoder"]
        unet = UNet1d(
            in_channels=m.get("in_channels", 1),
            channels=tuple(m["channels"]),
            factors=tuple(m["factors"]),
            items=tuple(m["items"]),
            attentions=tuple(m["attentions"]),
            cross_attentions=tuple(m["cross_attentions"]),
            context_channels=tuple(m["context_channels"]),
            attention_heads=m.get("attention_heads", 8),
            attention_features=m.get("attention_features", 64),
            embedding_features=m.get("embedding_features", 512),
            embedding_max_length=m.get("embedding_max_length", 1),
            use_embedding_cfg=m.get("use_embedding_cfg", True),
            flash_attention=m.get("flash_attention", False),
            fused_stats=fused_stats,
            dtype=dtype,
        )
        encoder = Encoder1d(
            in_channels=e.get("in_channels", 1),
            channels=e["channels"],
            multipliers=tuple(e["multipliers"]),
            factors=tuple(e["factors"]),
            num_blocks=tuple(e["num_blocks"]),
            resnet_groups=e.get("resnet_groups", 2),
            patch_size=e.get("patch_size", 1),
            dtype=dtype,
        )
        return cls(unet=unet, onsets_encoder=encoder, fold_cap=fold_cap)

    def init(self, key: jax.Array, length: int, batch: int = 1) -> dict:
        # Jitted as one program: eager init dispatches thousands of tiny ops,
        # which is pathological on high-latency device links.
        def _init(key):
            k1, k2, k3 = jax.random.split(key, 3)
            x = jnp.zeros((batch, length, self.unet.in_channels))
            onsets = jnp.zeros((batch, length, self.onsets_encoder.in_channels))
            enc_params = self.onsets_encoder.init(k1, onsets)
            context = self.encode_context(enc_params, onsets)
            emb = jnp.zeros(
                (batch, self.unet.embedding_max_length, self.unet.embedding_features)
            )
            sigma = jnp.zeros((batch,))
            unet_params = self.unet.init(
                {"params": k2, "cfg": k3}, x, sigma, context=context, embedding=emb
            )
            return {"unet": unet_params, "encoder": enc_params}

        return jax.jit(_init)(key)

    # ---------------------------------------------------------- forward
    def encode_context(self, enc_params: Any, onsets: jax.Array) -> list[jax.Array]:
        """Onset track (B, L, 1) → the UNet context pyramid (xs[2:-1],
        reference: main/module_diffusion.py:76-77)."""
        _, info = self.onsets_encoder.apply(enc_params, onsets, with_info=True)
        return info["xs"][2:-1]

    def loss(
        self,
        params: dict,
        key: jax.Array,
        wav: jax.Array,
        onsets: jax.Array,
        embedding: Optional[jax.Array],
        embedding_mask_proba: float = 0.0,
    ) -> jax.Array:
        context = self.encode_context(params["encoder"], onsets)
        return v_diffusion_loss(
            self._unet_apply(),
            params["unet"],
            key,
            wav,
            context=context,
            embedding=embedding,
            embedding_mask_proba=embedding_mask_proba,
        )

    def sample(
        self,
        params: dict,
        noise: jax.Array,
        onsets: jax.Array,
        embedding: Optional[jax.Array],
        num_steps: int = 150,
        embedding_scale: float = 1.0,
        guidance_interval: Optional[tuple[float, float]] = None,
        sampler: str = "ddim",
        deep_cache_interval: int = 0,
        deep_split: int = 4,
        deep_cache_pow: float = 1.0,
    ) -> jax.Array:
        """Generate waveforms from noise (B, L, 1) conditioned on onsets +
        embedding (reference eval protocol: 150 steps, scale 2.0 —
        exp/evaluate_gh_gen.yaml:22-23).

        ``guidance_interval=(lo, hi)`` restricts CFG to that sigma band
        (steps outside run the conditional branch only, at half compute) —
        see models/diffusion.v_sample.

        ``sampler``: "ddim" (reference VSampler semantics) or "dpm"
        (DPM-Solver++(2M), models/diffusion.dpm_sample — second-order,
        holds quality at several-fold fewer steps).

        ``deep_cache_interval=K`` (K>1): DeepCache deep-feature reuse —
        the UNet's levels >= ``deep_split`` (bottleneck + deep up path)
        recompute only every K-th sampler step (models/diffusion.py,
        unet1d_folded.folded_apply).  Folded execution path only
        (``fold_cap`` set): the feature lives in the folded apply.
        ``deep_cache_pow != 1`` switches to the non-uniform cadence of
        models/diffusion.deep_cache_refresh_mask (same refresh count;
        pow > 1 refreshes denser at low sigma).

        With ``fold_cap`` set, the whole scan carry stays in folded layout:
        noise is folded once, the context pyramid is folded once (outside
        the 150-step loop), and the waveform is unfolded once at the end —
        the narrow (B, L, 1) array never round-trips HBM per step.
        """
        context = self.encode_context(params["encoder"], onsets)
        sample_fn = {"ddim": v_sample, "dpm": dpm_sample}[sampler]
        deep_kw = (
            dict(deep_cache_interval=deep_cache_interval, deep_split=deep_split,
                 deep_cache_pow=deep_cache_pow)
            if deep_cache_interval and deep_cache_interval > 1
            else {}
        )

        if self.fold_cap and isinstance(self.unet, UNet1d):
            from syncfusion_tpu.models.unet1d_folded import compute_folds, folded_apply
            from syncfusion_tpu.ops.folded import fold, unfold

            folds = compute_folds(self.unet, self.fold_cap, noise.shape[1])
            entry_fold = folds[0] * self.unet.factors[0]
            out_ch = self.unet.out_channels or self.unet.in_channels
            if entry_fold > 1 and out_ch == self.unet.in_channels:
                ctx_f = [
                    fold(c, folds[i]) if (c is not None and folds[i] > 1) else c
                    for i, c in enumerate(context)
                ]

                def apply_fn(variables, x, sigma, **kw):
                    # flash=True: sampling needs no attention VJP, and the
                    # Pallas kernel avoids the 1 GB f32 score materialization
                    return folded_apply(
                        self.unet, variables, x, sigma, fold_cap=self.fold_cap,
                        io_folded=True, context_folded=True, folds=folds,
                        flash=True, **kw,
                    )

                out = sample_fn(
                    apply_fn, params["unet"], fold(noise, entry_fold), num_steps,
                    context=ctx_f, embedding=embedding,
                    embedding_scale=embedding_scale,
                    guidance_interval=guidance_interval,
                    **deep_kw,
                )
                return unfold(out, entry_fold)

        if deep_kw and not (self.fold_cap and isinstance(self.unet, UNet1d)):
            raise ValueError(
                "deep_cache_interval requires the folded execution path "
                "(set fold_cap; compat modules are unsupported)"
            )
        # NB: with fold_cap set but degenerate folds (indivisible length or
        # out_channels != in_channels) _unet_apply() is still the folded
        # apply, which supports the deep-cache kwargs — pass them through.
        return sample_fn(
            self._unet_apply(),
            params["unet"],
            noise,
            num_steps,
            context=context,
            embedding=embedding,
            embedding_scale=embedding_scale,
            guidance_interval=guidance_interval,
            **deep_kw,
        )

    def param_count(self, params: dict) -> int:
        return sum(x.size for x in jax.tree_util.tree_leaves(params))
