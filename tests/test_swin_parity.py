"""Swin transformer parity vs Hugging Face's SwinModel (torch, config-only).

Validates the HTSAT trunk's math — windowed attention with relative position
bias, shifted-window masking, patch merging — against an independent
reference implementation with converted weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp
from flax import linen as nn

from syncfusion_tpu.core.checkpoint import t_conv2d, t_linear
from syncfusion_tpu.models.clap.swin import SwinStage


class _Trunk(nn.Module):
    """patch-embed + stages + final norm, mirroring HTSAT's structure."""

    embed_dim: int = 8
    depths: tuple = (2, 2)
    num_heads: tuple = (2, 4)
    window: int = 4
    patch: int = 4
    res0: int = 8

    @nn.compact
    def __call__(self, image):
        x = nn.Conv(self.embed_dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), name="patch_embed")(image)
        b, h, w, c = x.shape
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x.reshape(b, h * w, c))
        res, dim = self.res0, self.embed_dim
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            x = SwinStage(dim=dim, input_resolution=res, depth=depth,
                          num_heads=heads, window_size=self.window,
                          downsample=i < len(self.depths) - 1,
                          name=f"layers_{i}")(x)
            if i < len(self.depths) - 1:
                res //= 2
                dim *= 2
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


def _convert_hf_swin(sd, depths):
    def ln(k):
        return {"scale": sd[f"{k}.weight"], "bias": sd[f"{k}.bias"]}

    def dense(k):
        return {"kernel": t_linear(sd[f"{k}.weight"]), "bias": sd[f"{k}.bias"]}

    p = {
        "patch_embed": {
            "kernel": t_conv2d(sd["embeddings.patch_embeddings.projection.weight"]),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "patch_norm": ln("embeddings.norm"),
        "norm": ln("layernorm"),
    }
    for i, depth in enumerate(depths):
        layer = {}
        for j in range(depth):
            src = f"encoder.layers.{i}.blocks.{j}"
            q = t_linear(sd[f"{src}.attention.self.query.weight"])
            k = t_linear(sd[f"{src}.attention.self.key.weight"])
            v = t_linear(sd[f"{src}.attention.self.value.weight"])
            qkv_b = np.concatenate([
                sd[f"{src}.attention.self.query.bias"],
                sd[f"{src}.attention.self.key.bias"],
                sd[f"{src}.attention.self.value.bias"],
            ])
            layer[f"blocks_{j}"] = {
                "norm1": ln(f"{src}.layernorm_before"),
                "norm2": ln(f"{src}.layernorm_after"),
                "attn": {
                    "qkv": {"kernel": np.concatenate([q, k, v], axis=1),
                            "bias": qkv_b},
                    "proj": dense(f"{src}.attention.output.dense"),
                    "relative_position_bias_table":
                        sd[f"{src}.attention.self.relative_position_bias_table"],
                },
                "mlp_fc1": dense(f"{src}.intermediate.dense"),
                "mlp_fc2": dense(f"{src}.output.dense"),
            }
        if f"encoder.layers.{i}.downsample.reduction.weight" in sd:
            layer["downsample"] = {
                "norm": ln(f"encoder.layers.{i}.downsample.norm"),
                "reduction": {"kernel": t_linear(
                    sd[f"encoder.layers.{i}.downsample.reduction.weight"])},
            }
        p[f"layers_{i}"] = layer
    return {"params": p}


def test_swin_trunk_matches_hf():
    cfg = transformers.SwinConfig(
        image_size=32, patch_size=4, num_channels=1, embed_dim=8,
        depths=[2, 2], num_heads=[2, 4], window_size=4, mlp_ratio=4.0,
        qkv_bias=True, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
        use_absolute_embeddings=False, layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    ref = transformers.SwinModel(cfg, add_pooling_layer=False).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()
          if "relative_position_index" not in k}

    x = np.random.default_rng(0).normal(size=(2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(pixel_values=torch.tensor(x)).last_hidden_state.numpy()

    trunk = _Trunk()
    params = _convert_hf_swin(sd, (2, 2))
    out_ours = np.asarray(trunk.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    ))
    np.testing.assert_allclose(out_ours, out_ref, atol=1e-4)
