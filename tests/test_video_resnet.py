"""Video ResNet family (models/video_resnet.py): geometry vs the
torchvision semantics the reference vendors (main/resnet.py) and
synthesized-state-dict converter round-trips for all three entry points
plus the Bottleneck variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syncfusion_tpu.models.video_resnet import (
    VideoResNet,
    convert_torch_video_resnet,
    mc3_18,
    r2plus1d_18,
    r3d_18,
)


def _from_flax_conv(kernel):  # (Kt,Kh,Kw,I,O) -> (O,I,Kt,Kh,Kw)
    return np.transpose(np.asarray(kernel), (4, 3, 0, 1, 2))


def _synth_state_dict(variables, arch):
    """Inverse of the converter: build a torchvision-layout state_dict from
    our params (same pattern as test_onset_net.py's roundtrip)."""
    p, s = variables["params"], variables["batch_stats"]
    sd = {}

    def put_bn(key, src_p, src_s):
        sd[f"{key}.weight"] = np.asarray(src_p["scale"])
        sd[f"{key}.bias"] = np.asarray(src_p["bias"])
        sd[f"{key}.running_mean"] = np.asarray(src_s["mean"])
        sd[f"{key}.running_var"] = np.asarray(src_s["var"])

    if arch == "r2plus1d_18":
        sd["stem.0.weight"] = _from_flax_conv(p["stem_spatial"]["kernel"])
        put_bn("stem.1", p["stem_bn1"], s["stem_bn1"])
        sd["stem.3.weight"] = _from_flax_conv(p["stem_temporal"]["kernel"])
        put_bn("stem.4", p["stem_bn2"], s["stem_bn2"])
    else:
        sd["stem.0.weight"] = _from_flax_conv(p["stem_conv"]["kernel"])
        put_bn("stem.1", p["stem_bn"], s["stem_bn"])

    for name in p:
        if not name.startswith("layer"):
            continue
        stage, b = name[5:].split("_")
        src = f"layer{stage}.{b}"
        blk_p, blk_s = p[name], s[name]
        for ci in (1, 2, 3):
            cp = blk_p.get(f"conv{ci}")
            if cp is None:
                continue
            if "spatial" in cp:  # factored builder: Sequential [0.0,0.1,_,0.3]
                sd[f"{src}.conv{ci}.0.0.weight"] = _from_flax_conv(
                    cp["spatial"]["kernel"])
                put_bn(f"{src}.conv{ci}.0.1", cp["bn"],
                       blk_s[f"conv{ci}"]["bn"])
                sd[f"{src}.conv{ci}.0.3.weight"] = _from_flax_conv(
                    cp["temporal"]["kernel"])
            elif "conv" in cp:  # plain builder module
                sd[f"{src}.conv{ci}.0.weight"] = _from_flax_conv(
                    cp["conv"]["kernel"])
            else:  # bottleneck 1×1×1
                sd[f"{src}.conv{ci}.0.weight"] = _from_flax_conv(cp["kernel"])
            put_bn(f"{src}.conv{ci}.1", blk_p[f"bn{ci}"], blk_s[f"bn{ci}"])
        if "downsample_conv" in blk_p:
            sd[f"{src}.downsample.0.weight"] = _from_flax_conv(
                blk_p["downsample_conv"]["kernel"])
            put_bn(f"{src}.downsample.1", blk_p["downsample_bn"],
                   blk_s["downsample_bn"])
    if "fc" in p:
        sd["fc.weight"] = np.asarray(p["fc"]["kernel"]).T
        sd["fc.bias"] = np.asarray(p["fc"]["bias"])
    return sd


@pytest.mark.parametrize("arch,builder_fn", [
    ("r3d_18", r3d_18), ("mc3_18", mc3_18), ("r2plus1d_18", r2plus1d_18),
])
def test_family_converter_roundtrip(arch, builder_fn):
    # single block per stage keeps the CPU cost tiny; the converter walks
    # layers/blocks generically so depth doesn't change the code path
    model = builder_fn(layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 8, 32, 32, 3))
    variables = jax.jit(
        lambda: model.init(jax.random.key(0), x, train=False))()

    sd = _synth_state_dict(variables, arch)
    converted = convert_torch_video_resnet(sd, arch=arch)

    xr = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 8, 32, 32, 3)), jnp.float32)
    fwd = jax.jit(lambda v: model.apply(v, xr, train=False))
    out_orig = fwd(variables)
    out_conv = fwd(converted)
    assert out_orig.shape == (1, 512)
    np.testing.assert_allclose(
        np.asarray(out_conv), np.asarray(out_orig), atol=1e-6)


def test_bottleneck_converter_roundtrip():
    """Bottleneck block (main/resnet.py:117-162): expansion 4, 1×1×1
    convs around the builder."""
    model = VideoResNet(builders=("simple",) * 4, stem="basic",
                        block="bottleneck", layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 4, 32, 32, 3))
    variables = jax.jit(
        lambda: model.init(jax.random.key(0), x, train=False))()

    sd = _synth_state_dict(variables, "r3d_18")
    converted = convert_torch_video_resnet(sd, arch="r3d_18")

    xr = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 4, 32, 32, 3)), jnp.float32)
    fwd = jax.jit(lambda v: model.apply(v, xr, train=False))
    out_orig = fwd(variables)
    out_conv = fwd(converted)
    assert out_orig.shape == (1, 2048)  # 512 × expansion 4
    np.testing.assert_allclose(
        np.asarray(out_conv), np.asarray(out_orig), atol=1e-6)


def test_family_stride_semantics():
    """r3d downsamples T (stride (s,s,s)); mc3 keeps T in layers 2-4
    (Conv3DNoTemporal stride (1,s,s)); full r2plus1d downsamples T via the
    temporal conv (stride (s,1,1)) — main/resnet.py:31-33,54-56,76-78."""
    x = jnp.zeros((1, 8, 32, 32, 3))

    def pre_pool_t(model):
        # temporal length of the last stage's output, via flax intermediates
        variables = jax.jit(
            lambda: model.init(jax.random.key(0), x, train=False))()
        _, state = model.apply(variables, x, train=False,
                               capture_intermediates=True,
                               mutable=["intermediates"])
        leaf = state["intermediates"]["layer4_0"]["__call__"][0]
        return leaf.shape[1]

    assert pre_pool_t(r3d_18(layers=(1, 1, 1, 1))) == 1       # 8→4→2→1
    assert pre_pool_t(mc3_18(layers=(1, 1, 1, 1))) == 8       # T preserved
    assert pre_pool_t(r2plus1d_18(layers=(1, 1, 1, 1))) == 1  # temporal conv strided
