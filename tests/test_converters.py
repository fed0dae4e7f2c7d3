"""Torch-checkpoint converter round-trips: synthesize torch-layout state
dicts from our own params, convert, and require identical outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syncfusion_tpu.models.mingpt import GPTConfig, GPTFeats
from syncfusion_tpu.models.vqgan.convert import convert_torch_mingpt, convert_torch_vqgan
from syncfusion_tpu.models.vqgan.model import VQModel


def _from_flax_conv2d(kernel):  # (Kh,Kw,I,O) -> (O,I,Kh,Kw)
    return np.transpose(np.asarray(kernel), (3, 2, 0, 1))


def test_vqgan_converter_roundtrip():
    model = VQModel(embed_dim=16, n_embed=32, ch=8, ch_mult=(1, 2), num_res_blocks=1,
                    attn_resolutions=(10,), resolution=20, z_channels=16)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 10, 20, 1)), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.key(0), x))()
    p = variables["params"]

    sd = {}

    def put_conv(dst, node):
        sd[f"{dst}.weight"] = _from_flax_conv2d(node["kernel"])
        sd[f"{dst}.bias"] = np.asarray(node["bias"])

    def put_gn(dst, node):
        sd[f"{dst}.weight"] = np.asarray(node["scale"])
        sd[f"{dst}.bias"] = np.asarray(node["bias"])

    def put_res(dst, node):
        put_gn(f"{dst}.norm1", node["GroupNorm_0"])
        put_conv(f"{dst}.conv1", node["conv1"])
        put_gn(f"{dst}.norm2", node["GroupNorm_1"])
        put_conv(f"{dst}.conv2", node["conv2"])
        if "nin_shortcut" in node:
            put_conv(f"{dst}.nin_shortcut", node["nin_shortcut"])

    def put_attn(dst, node):
        put_gn(f"{dst}.norm", node["GroupNorm_0"])
        for nm in ("q", "k", "v", "proj_out"):
            put_conv(f"{dst}.{nm}", node[nm])

    enc, dec = p["encoder"], p["decoder"]
    put_conv("encoder.conv_in", enc["conv_in"])
    for i in range(2):
        for j in range(1):
            put_res(f"encoder.down.{i}.block.{j}", enc[f"down_{i}_block_{j}"])
            if f"down_{i}_attn_{j}" in enc:
                put_attn(f"encoder.down.{i}.attn.{j}", enc[f"down_{i}_attn_{j}"])
        if f"down_{i}_downsample" in enc:
            put_conv(f"encoder.down.{i}.downsample.conv",
                     enc[f"down_{i}_downsample"]["Conv_0"])
    put_res("encoder.mid.block_1", enc["mid_block_1"])
    put_attn("encoder.mid.attn_1", enc["mid_attn_1"])
    put_res("encoder.mid.block_2", enc["mid_block_2"])
    put_gn("encoder.norm_out", enc["norm_out"])
    put_conv("encoder.conv_out", enc["conv_out"])

    put_conv("decoder.conv_in", dec["conv_in"])
    put_res("decoder.mid.block_1", dec["mid_block_1"])
    put_attn("decoder.mid.attn_1", dec["mid_attn_1"])
    put_res("decoder.mid.block_2", dec["mid_block_2"])
    for i in range(2):
        for j in range(2):
            put_res(f"decoder.up.{i}.block.{j}", dec[f"up_{i}_block_{j}"])
            if f"up_{i}_attn_{j}" in dec:
                put_attn(f"decoder.up.{i}.attn.{j}", dec[f"up_{i}_attn_{j}"])
        if f"up_{i}_upsample" in dec:
            put_conv(f"decoder.up.{i}.upsample.conv", dec[f"up_{i}_upsample"]["Conv_0"])
    put_gn("decoder.norm_out", dec["norm_out"])
    put_conv("decoder.conv_out", dec["conv_out"])

    sd["quantize.embedding.weight"] = np.asarray(p["quantize"]["embedding"])
    put_conv("quant_conv", p["quant_conv"])
    put_conv("post_quant_conv", p["post_quant_conv"])

    converted = convert_torch_vqgan(sd, ch_mult=(1, 2), num_res_blocks=1)
    out_orig = model.apply(variables, x)
    out_conv = model.apply(converted, x)
    np.testing.assert_allclose(np.asarray(out_conv[0]), np.asarray(out_orig[0]),
                               atol=1e-6)


def test_mingpt_converter_roundtrip():
    cfg = GPTConfig(vocab_size=16, block_size=24, n_layer=2, n_head=2, n_embd=8)
    net = GPTFeats(cfg)
    toks = jnp.zeros((1, 6), jnp.int32)
    feats = jnp.zeros((1, 4, 8))
    variables = jax.jit(lambda: net.init(jax.random.key(0), toks, feats))()
    p = variables["params"]

    sd = {}
    sd["tok_emb.weight"] = np.asarray(p["tok_emb"]["embedding"])
    sd["pos_emb"] = np.asarray(p["pos_emb"])[None]
    sd["ln_f.weight"] = np.asarray(p["ln_f"]["scale"])
    sd["ln_f.bias"] = np.asarray(p["ln_f"]["bias"])
    sd["head.weight"] = np.asarray(p["head"]["kernel"]).T
    w = np.asarray(p["feat_proj"]["kernel"])  # (512, n_embd)
    sd["embedder.weight"] = w.T[:, :, None]
    sd["embedder.bias"] = np.asarray(p["feat_proj"]["bias"])
    for i in range(2):
        blk = p[f"h_{i}"]
        for nm in ("ln1", "ln2"):
            sd[f"blocks.{i}.{nm}.weight"] = np.asarray(blk[nm]["scale"])
            sd[f"blocks.{i}.{nm}.bias"] = np.asarray(blk[nm]["bias"])
        qkv_k = np.asarray(blk["attn"]["qkv"]["kernel"])  # (C, 3C)
        qkv_b = np.asarray(blk["attn"]["qkv"]["bias"])
        c = qkv_k.shape[0]
        for slot, nm in enumerate(("query", "key", "value")):
            sd[f"blocks.{i}.attn.{nm}.weight"] = qkv_k[:, slot * c:(slot + 1) * c].T
            sd[f"blocks.{i}.attn.{nm}.bias"] = qkv_b[slot * c:(slot + 1) * c]
        sd[f"blocks.{i}.attn.proj.weight"] = np.asarray(blk["attn"]["proj"]["kernel"]).T
        sd[f"blocks.{i}.attn.proj.bias"] = np.asarray(blk["attn"]["proj"]["bias"])
        sd[f"blocks.{i}.mlp.0.weight"] = np.asarray(blk["mlp_fc"]["kernel"]).T
        sd[f"blocks.{i}.mlp.0.bias"] = np.asarray(blk["mlp_fc"]["bias"])
        sd[f"blocks.{i}.mlp.2.weight"] = np.asarray(blk["mlp_proj"]["kernel"]).T
        sd[f"blocks.{i}.mlp.2.bias"] = np.asarray(blk["mlp_proj"]["bias"])

    converted = convert_torch_mingpt(sd, prefix="")
    toks = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.int32)
    feats = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4, 8)), jnp.float32)
    out_orig = net.apply(variables, toks, feats)
    out_conv = net.apply(converted, toks, feats)
    np.testing.assert_allclose(np.asarray(out_conv), np.asarray(out_orig), atol=1e-5)
