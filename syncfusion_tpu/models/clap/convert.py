"""laion_clap 630k checkpoint → Flax parameter tree.

Maps the public ``630k-audioset-best.pt`` state dict (keys under
``audio_branch.`` = HTSAT, ``text_branch.`` = HF RoBERTa,
``audio_projection.``/``text_projection.`` = MLP heads) onto the modules in
this package.

NOTE: numerical validation against the reference embedder requires the
checkpoint, which zero-egress environments cannot fetch; the mapping is
structured so a parity round with the file present can adjust the HTSAT
latent head if needed (see htsat.py docstring).
"""

from __future__ import annotations

import numpy as np

from syncfusion_tpu.core.checkpoint import t_conv2d, t_linear


def _strip(sd: dict, prefixes=("module.", "model.")) -> dict:
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = np.asarray(v)
    return out


def _ln(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _dense(sd, key):
    return {"kernel": t_linear(sd[f"{key}.weight"]), "bias": sd[f"{key}.bias"]}


def _convert_audio(sd: dict) -> dict:
    """laion-named audio tower keys → top-level param entries
    (audio_branch, mel_bn_*, audio_projection)."""
    p: dict = {}
    ab = "audio_branch"
    audio: dict = {}
    audio["patch_embed"] = {
        "kernel": t_conv2d(sd[f"{ab}.patch_embed.proj.weight"]),
        "bias": sd[f"{ab}.patch_embed.proj.bias"],
    }
    audio["patch_norm"] = _ln(sd, f"{ab}.patch_embed.norm")
    depths = (2, 2, 6, 2)
    for li, depth in enumerate(depths):
        layer: dict = {}
        for bi in range(depth):
            src = f"{ab}.layers.{li}.blocks.{bi}"
            qkv_w = sd[f"{src}.attn.qkv.weight"]
            blk = {
                "norm1": _ln(sd, f"{src}.norm1"),
                "norm2": _ln(sd, f"{src}.norm2"),
                "attn": {
                    "qkv": {
                        "kernel": t_linear(qkv_w),
                        "bias": sd[f"{src}.attn.qkv.bias"],
                    },
                    "proj": _dense(sd, f"{src}.attn.proj"),
                    "relative_position_bias_table": sd[
                        f"{src}.attn.relative_position_bias_table"
                    ],
                },
                "mlp_fc1": _dense(sd, f"{src}.mlp.fc1"),
                "mlp_fc2": _dense(sd, f"{src}.mlp.fc2"),
            }
            layer[f"blocks_{bi}"] = blk
        if li < len(depths) - 1:
            layer["downsample"] = {
                "norm": _ln(sd, f"{ab}.layers.{li}.downsample.norm"),
                "reduction": {
                    "kernel": t_linear(sd[f"{ab}.layers.{li}.downsample.reduction.weight"])
                },
            }
        audio[f"layers_{li}"] = layer
    audio["norm"] = _ln(sd, f"{ab}.norm")
    p["audio_branch"] = audio

    # HTSAT input BN over mel bins (bn0)
    p["mel_bn_scale"] = sd[f"{ab}.bn0.weight"]
    p["mel_bn_bias"] = sd[f"{ab}.bn0.bias"]
    p["mel_bn_mean"] = sd[f"{ab}.bn0.running_mean"]
    p["mel_bn_var"] = sd[f"{ab}.bn0.running_var"]

    p["audio_projection"] = {
        "linear1": _dense(sd, "audio_projection.0"),
        "linear2": _dense(sd, "audio_projection.2"),
    }
    return p


def convert_laion_clap(state_dict: dict) -> dict:
    sd = _strip(state_dict)
    p: dict = _convert_audio(sd)

    # ---------------------------------------------------------- RoBERTa
    tb = "text_branch"
    text: dict = {
        "embeddings": {
            "word_embeddings": {"embedding": sd[f"{tb}.embeddings.word_embeddings.weight"]},
            "position_embeddings": {
                "embedding": sd[f"{tb}.embeddings.position_embeddings.weight"]
            },
            "token_type_embeddings": {
                "embedding": sd[f"{tb}.embeddings.token_type_embeddings.weight"]
            },
            "LayerNorm": _ln(sd, f"{tb}.embeddings.LayerNorm"),
        }
    }
    li = 0
    while f"{tb}.encoder.layer.{li}.attention.self.query.weight" in sd:
        src = f"{tb}.encoder.layer.{li}"
        text[f"layer_{li}"] = {
            "attention_q": _dense(sd, f"{src}.attention.self.query"),
            "attention_k": _dense(sd, f"{src}.attention.self.key"),
            "attention_v": _dense(sd, f"{src}.attention.self.value"),
            "attention_out": _dense(sd, f"{src}.attention.output.dense"),
            "attention_norm": _ln(sd, f"{src}.attention.output.LayerNorm"),
            "intermediate": _dense(sd, f"{src}.intermediate.dense"),
            "output": _dense(sd, f"{src}.output.dense"),
            "output_norm": _ln(sd, f"{src}.output.LayerNorm"),
        }
        li += 1
    p["text_branch"] = text

    # ------------------------------------------------------- projections
    p["text_projection"] = {
        "linear1": _dense(sd, "text_projection.0"),
        "linear2": _dense(sd, "text_projection.2"),
    }
    return {"params": p}


def hf_clap_audio_to_laion(state_dict: dict) -> dict:
    """Rename ``transformers`` CLAP audio-tower keys to laion_clap names.

    Covers ClapAudioModel(WithProjection) state dicts
    (``audio_model.audio_encoder.*`` + ``audio_projection.linear{1,2}``):
    HF splits the fused qkv into query/key/value and renames the Swin block
    internals; laion fuses qkv and uses timm-style names.  Used by the live
    HF parity test and by users converting HF-format CLAP checkpoints.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: dict = {}
    qkv: dict = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "relative_position_index" in k:
            continue
        k = k.replace("audio_model.audio_encoder.", "audio_branch.")
        k = k.replace("audio_projection.linear1.", "audio_projection.0.")
        k = k.replace("audio_projection.linear2.", "audio_projection.2.")
        k = k.replace(".layernorm_before.", ".norm1.")
        k = k.replace(".layernorm_after.", ".norm2.")
        k = k.replace(".attention.output.dense.", ".attn.proj.")
        k = k.replace(".attention.self.relative_position_bias_table",
                      ".attn.relative_position_bias_table")
        k = k.replace(".intermediate.dense.", ".mlp.fc1.")
        k = k.replace(".output.dense.", ".mlp.fc2.")
        k = k.replace("audio_branch.batch_norm.", "audio_branch.bn0.")
        if ".attention.self." in k:  # query/key/value → fused qkv
            base, leaf = k.rsplit(".attention.self.", 1)
            which, kind = leaf.split(".")
            qkv.setdefault((base, kind), {})[which] = v
            continue
        out[k] = v
    for (base, kind), parts in qkv.items():
        out[f"{base}.attn.qkv.{kind}"] = np.concatenate(
            [parts["query"], parts["key"], parts["value"]], axis=0
        )
    return out


def convert_hf_clap_audio(state_dict: dict) -> dict:
    """transformers ClapAudioModelWithProjection state dict → the audio
    subtree of :class:`~syncfusion_tpu.models.clap.model.ClapModel` params
    (audio_branch, mel_bn_*, audio_projection)."""
    return _convert_audio(hf_clap_audio_to_laion(state_dict))
