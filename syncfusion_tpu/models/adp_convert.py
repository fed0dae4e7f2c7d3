"""Checkpoint converter: audio-diffusion-pytorch torch weights → JAX compat.

Ingests the reference's published Lightning checkpoint
(``epoch=784-valid_loss=0.008.ckpt``, loaded by the reference at
/root/reference/main/generation.py:40-43 via ``torch.load(...)["state_dict"]``)
into the param trees of models/adp_compat.{UNetV0Compat, Encoder1dCompat}.

Two-stage matching:

1. **Name-based**: checkpoints whose keys follow the recon naming of
   models/adp_torch_recon.py (used by all tests) convert directly.
2. **Positional**: real a-unet checkpoints use upstream's anonymous
   ``blocks.N`` module names.  Since torch ``state_dict()`` preserves module
   registration order, the converter aligns the foreign keys against the
   recon manifest by (order, shape) and reports every name it rebinds.
   A shape-sequence mismatch raises with the first diverging index — that
   pinpoints which structural decision (D1-D11, see adp_torch_recon.py)
   needs adjusting when the real checkpoint is available.

Layout rules (torch → flax):
  Linear (O,I) → Dense kernel (I,O);  Conv1d (O,I,K) → Conv kernel (K,I,O);
  ConvTranspose1d (I,O,K) → kernel (K,I,O);  GroupNorm/LayerNorm weight →
  scale;  Embedding weight direct.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from syncfusion_tpu.models.adp_torch_recon import (
    Encoder1dConfig,
    UNetV0Config,
    encoder_manifest,
    unet_manifest,
)


def _np(sd: dict) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        a = v if isinstance(v, np.ndarray) else np.asarray(
            v.detach().cpu().float() if hasattr(v, "detach") else v
        )
        out[k] = a
    return out


def strip_prefix(sd: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def align_to_manifest(
    sd: Dict[str, np.ndarray], manifest: List[Tuple[str, tuple]], label: str
) -> Dict[str, np.ndarray]:
    """Return ``sd`` re-keyed to manifest names (name match or positional)."""
    want = {k for k, _ in manifest}
    if want <= set(sd.keys()):
        extra = set(sd.keys()) - want
        if extra:
            raise ValueError(
                f"{label}: {len(extra)} unexpected keys alongside exact-name "
                f"match, e.g. {sorted(extra)[:5]}"
            )
        return sd
    # positional: registration order + shape
    if len(sd) != len(manifest):
        raise ValueError(
            f"{label}: checkpoint has {len(sd)} tensors, manifest expects "
            f"{len(manifest)} — structural mismatch (see adp_torch_recon.py "
            "decision log)"
        )
    renamed, rebound = {}, []
    for (fk, fv), (mk, mshape) in zip(sd.items(), manifest):
        if tuple(fv.shape) != tuple(mshape):
            raise ValueError(
                f"{label}: shape mismatch at manifest entry '{mk}' "
                f"{tuple(mshape)} vs checkpoint '{fk}' {tuple(fv.shape)} — "
                "first structural divergence; adjust the flagged decision in "
                "adp_torch_recon.py"
            )
        renamed[mk] = fv
        if fk != mk:
            rebound.append((fk, mk))
    if rebound:
        import logging

        logging.getLogger("adp_convert").info(
            "%s: positionally rebound %d/%d keys (e.g. %s → %s)",
            label, len(rebound), len(manifest), *rebound[0],
        )
    return renamed


# --------------------------------------------------------------------------
# tensor-layout helpers
# --------------------------------------------------------------------------

def _lin(sd, key, bias=True):
    p = {"kernel": np.transpose(sd[f"{key}.weight"], (1, 0))}
    if bias:
        p["bias"] = sd[f"{key}.bias"]
    return p


def _conv(sd, key):
    return {"kernel": np.transpose(sd[f"{key}.weight"], (2, 1, 0)),
            "bias": sd[f"{key}.bias"]}


def _norm(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


# --------------------------------------------------------------------------
# UNetV0
# --------------------------------------------------------------------------

def _item_params(sd, prefix: str, kind: str) -> dict:
    if kind == "res":
        return {"gn1": _norm(sd, f"{prefix}.gn1"), "conv1": _conv(sd, f"{prefix}.conv1"),
                "gn2": _norm(sd, f"{prefix}.gn2"), "conv2": _conv(sd, f"{prefix}.conv2")}
    if kind == "mod":
        return {"to_scale_shift": _lin(sd, f"{prefix}.to_scale_shift"),
                "norm": _norm(sd, f"{prefix}.norm")}
    if kind == "inj":
        return {"conv": _conv(sd, f"{prefix}.conv")}
    return {"norm": _norm(sd, f"{prefix}.norm"),
            "norm_context": _norm(sd, f"{prefix}.norm_context"),
            "to_q": _lin(sd, f"{prefix}.to_q", bias=False),
            "to_kv": _lin(sd, f"{prefix}.to_kv", bias=False),
            "to_out": _lin(sd, f"{prefix}.to_out")}


def _block_params(sd, prefix: str, cfg: UNetV0Config, level: int) -> dict:
    p: dict = {"downsample": _conv(sd, f"{prefix}.downsample")}
    kinds = cfg.item_kinds(level)
    for j, k in enumerate(kinds):
        p[f"items_down_{j}"] = _item_params(sd, f"{prefix}.items_down.{j}", k)
    if level + 1 < len(cfg.channels):
        p["inner"] = _block_params(sd, f"{prefix}.inner", cfg, level + 1)
        for j in range(len(kinds)):
            p[f"skip_adapters_{j}"] = {
                "conv": _conv(sd, f"{prefix}.skip_adapters.{j}.conv")
            }
    for j, k in enumerate(kinds):
        p[f"items_up_{j}"] = _item_params(sd, f"{prefix}.items_up.{j}", k)
    p["upsample_kernel"] = np.transpose(sd[f"{prefix}.upsample.weight"], (2, 0, 1))
    p["upsample_bias"] = sd[f"{prefix}.upsample.bias"]
    return p


def convert_unet_state(state_dict: dict, cfg: UNetV0Config) -> dict:
    """UNetV0 torch state_dict → ``{"params": ...}`` for UNetV0Compat."""
    sd = align_to_manifest(_np(state_dict), unet_manifest(cfg), "UNetV0")
    params: dict = {
        "embedder_weights": sd["embedder.weights"],
        "embedder_to_out": _lin(sd, "embedder.to_out"),
        "mlp_0": _lin(sd, "mlp.0.0"),
        "mlp_1": _lin(sd, "mlp.1.0"),
        "net": _block_params(sd, "net", cfg, 0),
    }
    if cfg.use_embedding_cfg:
        params["fixed_embedding"] = sd["fixed_embedding.weight"]
    return {"params": params}


# --------------------------------------------------------------------------
# Encoder1d
# --------------------------------------------------------------------------

def convert_encoder_state(state_dict: dict, cfg: Encoder1dConfig) -> dict:
    """aep Encoder1d torch state_dict → params for Encoder1dCompat."""
    sd = align_to_manifest(_np(state_dict), encoder_manifest(cfg), "Encoder1d")
    params: dict = {
        "to_in_gn": _norm(sd, "to_in.groupnorm"),
        "to_in_conv": _conv(sd, "to_in.project"),
    }
    for i in range(len(cfg.factors)):
        params[f"ds{i}_down"] = _conv(sd, f"downsamples.{i}.downsample")
        for j in range(cfg.num_blocks[i]):
            base = f"downsamples.{i}.blocks.{j}"
            params[f"ds{i}_b{j}_gn1"] = _norm(sd, f"{base}.block1.groupnorm")
            params[f"ds{i}_b{j}_conv1"] = _conv(sd, f"{base}.block1.project")
            params[f"ds{i}_b{j}_gn2"] = _norm(sd, f"{base}.block2.groupnorm")
            params[f"ds{i}_b{j}_conv2"] = _conv(sd, f"{base}.block2.project")
    return {"params": params}


# --------------------------------------------------------------------------
# Full Lightning checkpoint
# --------------------------------------------------------------------------

def convert_diffusion_ckpt(
    state_dict: dict,
    unet_cfg: UNetV0Config | None = None,
    enc_cfg: Encoder1dConfig | None = None,
) -> dict:
    """Reference module_diffusion.Model state_dict → SyncFusionDiffusion params.

    Splits ``model.net.*`` (UNetV0 — ``model.diffusion.net.*`` /
    ``model.sampler.net.*`` are the same shared module and are dropped) and
    ``onsets_encoder.*``; ``embedder.*`` (frozen CLAP) is left to the CLAP
    converter (models/clap/convert.py).
    """
    unet_cfg = unet_cfg or UNetV0Config()
    enc_cfg = enc_cfg or Encoder1dConfig()
    unet_sd = strip_prefix(state_dict, "model.net.")
    enc_sd = strip_prefix(state_dict, "onsets_encoder.")
    if not unet_sd:
        raise ValueError("no 'model.net.*' keys — not a diffusion checkpoint")
    if not enc_sd:
        raise ValueError("no 'onsets_encoder.*' keys in checkpoint")
    return {
        "unet": convert_unet_state(unet_sd, unet_cfg),
        "encoder": convert_encoder_state(enc_sd, enc_cfg),
    }


def load_diffusion_ckpt(path, unet_cfg=None, enc_cfg=None) -> dict:
    """torch.load a Lightning ``.ckpt``/``.pt`` and convert (lazy torch)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return convert_diffusion_ckpt(sd, unet_cfg, enc_cfg)
