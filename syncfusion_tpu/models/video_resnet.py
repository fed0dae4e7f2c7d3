"""Complete torchvision-style video ResNet family.

The onset model only ever uses the keep-temporal R(2+1)D-18 surgery
(models/onset_net.py), but the reference vendors the whole torchvision
family (main/resnet.py): three conv builders (``Conv3DSimple``,
``Conv3DNoTemporal``, ``Conv2Plus1D`` — main/resnet.py:15-78), two stems
(:165-192), ``BasicBlock``/``Bottleneck`` (:81-162) and the
``r3d_18`` / ``mc3_18`` / ``r2plus1d_18`` entry points (:298-347).  This
module provides the same family with UNMODIFIED torchvision stride
semantics (temporal stride = ``stride`` where torchvision says so —
unlike the onset surgery, which pins it to 1), plus a Kinetics
``state_dict`` converter for all three entry points.

Layout: channels-last ``(B, T, H, W, 3)``.  Forward mirrors the
reference's patched ``VideoResNet.forward`` (main/resnet.py:234-251):
global (T,H,W) average pool, squeeze — the fc head is bypassed there, so
``num_classes=None`` reproduces it; pass an int to apply the head.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from syncfusion_tpu.models.onset_net import midplanes


def _bn(train: bool, name: str) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class Conv3DSimple(nn.Module):
    """Full 3×3×3 conv, stride (s,s,s) (main/resnet.py:15-33)."""

    out_planes: int
    mid_planes: int = 0  # unused; uniform builder signature
    stride: int = 1
    dtype: Any = jnp.float32

    downsample_stride = staticmethod(lambda s: (s, s, s))

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return nn.Conv(self.out_planes, (3, 3, 3),
                       strides=(self.stride,) * 3,
                       padding=((1, 1), (1, 1), (1, 1)),
                       use_bias=False, dtype=self.dtype, name="conv")(x)


class Conv3DNoTemporal(nn.Module):
    """1×3×3 conv, stride (1,s,s) (main/resnet.py:59-78)."""

    out_planes: int
    mid_planes: int = 0
    stride: int = 1
    dtype: Any = jnp.float32

    downsample_stride = staticmethod(lambda s: (1, s, s))

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return nn.Conv(self.out_planes, (1, 3, 3),
                       strides=(1, self.stride, self.stride),
                       padding=((0, 0), (1, 1), (1, 1)),
                       use_bias=False, dtype=self.dtype, name="conv")(x)


class Conv2Plus1DFull(nn.Module):
    """Factored (1,3,3)+(3,1,1) conv with torchvision stride semantics:
    spatial stride on the first conv AND temporal stride on the second
    (main/resnet.py:36-56) — the onset surgery's variant pins the temporal
    stride to 1 instead."""

    out_planes: int
    mid_planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    downsample_stride = staticmethod(lambda s: (s, s, s))

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.mid_planes, (1, 3, 3),
                    strides=(1, self.stride, self.stride),
                    padding=((0, 0), (1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="spatial")(x)
        x = _bn(train, "bn")(x)
        x = nn.relu(x)
        return nn.Conv(self.out_planes, (3, 1, 1),
                       strides=(self.stride, 1, 1),
                       padding=((1, 1), (0, 0), (0, 0)),
                       use_bias=False, dtype=self.dtype, name="temporal")(x)


_BUILDERS = {"simple": Conv3DSimple, "no_temporal": Conv3DNoTemporal,
             "2plus1d": Conv2Plus1DFull}


class FamilyBasicBlock(nn.Module):
    """BasicBlock over any conv builder (main/resnet.py:81-114)."""

    planes: int
    builder: str
    stride: int = 1
    dtype: Any = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = _BUILDERS[self.builder]
        mid = midplanes(x.shape[-1], self.planes)
        residual = x

        h = conv(self.planes, mid, stride=self.stride, dtype=self.dtype,
                 name="conv1")(x, train)
        h = _bn(train, "bn1")(h)
        h = nn.relu(h)
        h = conv(self.planes, mid, dtype=self.dtype, name="conv2")(h, train)
        h = _bn(train, "bn2")(h)

        if self.stride != 1 or x.shape[-1] != self.planes:
            ds = conv.downsample_stride(self.stride)
            residual = nn.Conv(self.planes, (1, 1, 1), strides=ds,
                               padding="VALID", use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = _bn(train, "downsample_bn")(residual)
        return nn.relu(h + residual)


class FamilyBottleneck(nn.Module):
    """Bottleneck: 1×1×1 → builder 3×3 → 1×1×1, expansion 4
    (main/resnet.py:117-162)."""

    planes: int
    builder: str
    stride: int = 1
    dtype: Any = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = _BUILDERS[self.builder]
        # torchvision computes midplanes from (inplanes, planes) — the
        # block's INPUT width, not the bottleneck width (resnet.py:123-124)
        mid = midplanes(x.shape[-1], self.planes)
        out_planes = self.planes * self.expansion
        residual = x

        h = nn.Conv(self.planes, (1, 1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = _bn(train, "bn1")(h)
        h = nn.relu(h)
        h = conv(self.planes, mid, stride=self.stride, dtype=self.dtype,
                 name="conv2")(h, train)
        h = _bn(train, "bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(out_planes, (1, 1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = _bn(train, "bn3")(h)

        if self.stride != 1 or x.shape[-1] != out_planes:
            ds = conv.downsample_stride(self.stride)
            residual = nn.Conv(out_planes, (1, 1, 1), strides=ds,
                               padding="VALID", use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = _bn(train, "downsample_bn")(residual)
        return nn.relu(h + residual)


class VideoResNet(nn.Module):
    """Generic video ResNet (main/resnet.py:195-285).

    ``builders`` — conv builder per stage; ``block`` — "basic"/"bottleneck";
    ``stem`` — "basic" (3×7×7) or "r2plus1d" (factored).  Output matches the
    reference's patched forward: pooled (B, 512·expansion) features; set
    ``num_classes`` to also apply the classifier head.
    """

    builders: Sequence[str] = ("2plus1d",) * 4
    layers: Sequence[int] = (2, 2, 2, 2)
    block: str = "basic"
    stem: str = "r2plus1d"
    num_classes: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.stem == "r2plus1d":  # R2Plus1dStem (main/resnet.py:177-192)
            x = nn.Conv(45, (1, 7, 7), strides=(1, 2, 2),
                        padding=((0, 0), (3, 3), (3, 3)), use_bias=False,
                        dtype=self.dtype, name="stem_spatial")(x)
            x = _bn(train, "stem_bn1")(x)
            x = nn.relu(x)
            x = nn.Conv(64, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                        use_bias=False, dtype=self.dtype,
                        name="stem_temporal")(x)
            x = _bn(train, "stem_bn2")(x)
        else:  # BasicStem (main/resnet.py:165-174)
            x = nn.Conv(64, (3, 7, 7), strides=(1, 2, 2),
                        padding=((1, 1), (3, 3), (3, 3)), use_bias=False,
                        dtype=self.dtype, name="stem_conv")(x)
            x = _bn(train, "stem_bn")(x)
        x = nn.relu(x)

        blk = FamilyBasicBlock if self.block == "basic" else FamilyBottleneck
        for stage, (planes, blocks, builder) in enumerate(
            zip((64, 128, 256, 512), self.layers, self.builders), start=1
        ):
            for b in range(blocks):
                stride = 2 if (stage > 1 and b == 0) else 1
                x = blk(planes, builder, stride=stride, dtype=self.dtype,
                        name=f"layer{stage}_{b}")(x, train)

        x = jnp.mean(x, axis=(1, 2, 3))  # AdaptiveAvgPool3d((1,1,1))
        if self.num_classes is not None:
            x = nn.Dense(self.num_classes, name="fc")(x)
        return x


def r3d_18(**kw) -> VideoResNet:
    """18-layer ResNet3D (main/resnet.py:298-313)."""
    return VideoResNet(builders=("simple",) * 4, stem="basic", **kw)


def mc3_18(**kw) -> VideoResNet:
    """18-layer mixed-convolution net (main/resnet.py:316-330)."""
    return VideoResNet(builders=("simple",) + ("no_temporal",) * 3,
                       stem="basic", **kw)


def r2plus1d_18(**kw) -> VideoResNet:
    """18-layer R(2+1)D, full torchvision strides (main/resnet.py:333-347)."""
    return VideoResNet(builders=("2plus1d",) * 4, stem="r2plus1d", **kw)


# --------------------------------------------------------------------------
# torchvision/Kinetics weight import (all three entry points)
# --------------------------------------------------------------------------

def convert_torch_video_resnet(
    state_dict: dict[str, np.ndarray],
    arch: str = "r2plus1d_18",
    num_classes: Optional[int] = None,
) -> dict:
    """Map a torchvision video-resnet ``state_dict`` (r3d_18 / mc3_18 /
    r2plus1d_18, and their Bottleneck variants) onto :class:`VideoResNet`'s
    tree.  ``num_classes=None`` drops the fc head like the reference's
    patched forward does."""
    from syncfusion_tpu.core.checkpoint import t_conv3d

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def put_bn(dst_p: dict, dst_s: dict, name: str, src: str):
        dst_p[name] = {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]}
        dst_s[name] = {"mean": sd[f"{src}.running_mean"],
                       "var": sd[f"{src}.running_var"]}

    if arch == "r2plus1d_18":
        params["stem_spatial"] = {"kernel": t_conv3d(sd["stem.0.weight"])}
        put_bn(params, stats, "stem_bn1", "stem.1")
        params["stem_temporal"] = {"kernel": t_conv3d(sd["stem.3.weight"])}
        put_bn(params, stats, "stem_bn2", "stem.4")
    else:
        params["stem_conv"] = {"kernel": t_conv3d(sd["stem.0.weight"])}
        put_bn(params, stats, "stem_bn", "stem.1")

    factored = arch == "r2plus1d_18"
    bottleneck = any(".conv3." in k for k in sd)
    n_convs = 3 if bottleneck else 2
    stage = 1
    while f"layer{stage}.0.conv1.0.weight" in sd or \
            f"layer{stage}.0.conv1.0.0.weight" in sd:
        b = 0
        while f"layer{stage}.{b}.conv1.0.weight" in sd or \
                f"layer{stage}.{b}.conv1.0.0.weight" in sd:
            src = f"layer{stage}.{b}"
            blk_p: dict = {}
            blk_s: dict = {}
            for ci in range(1, n_convs + 1):
                # Bottleneck conv1/conv3 are plain 1×1×1 convs even in the
                # factored arch (main/resnet.py:127-144)
                is_factored = factored and (not bottleneck or ci == 2)
                if is_factored:
                    conv_p: dict = {"spatial": {
                        "kernel": t_conv3d(sd[f"{src}.conv{ci}.0.0.weight"])}}
                    conv_s: dict = {}
                    put_bn(conv_p, conv_s, "bn", f"{src}.conv{ci}.0.1")
                    conv_p["temporal"] = {
                        "kernel": t_conv3d(sd[f"{src}.conv{ci}.0.3.weight"])}
                    blk_p[f"conv{ci}"], blk_s[f"conv{ci}"] = conv_p, conv_s
                elif bottleneck and ci != 2:
                    blk_p[f"conv{ci}"] = {
                        "kernel": t_conv3d(sd[f"{src}.conv{ci}.0.weight"])}
                else:
                    blk_p[f"conv{ci}"] = {"conv": {
                        "kernel": t_conv3d(sd[f"{src}.conv{ci}.0.weight"])}}
                put_bn(blk_p, blk_s, f"bn{ci}", f"{src}.conv{ci}.1")
            if f"{src}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": t_conv3d(sd[f"{src}.downsample.0.weight"])}
                put_bn(blk_p, blk_s, "downsample_bn", f"{src}.downsample.1")
            params[f"layer{stage}_{b}"] = blk_p
            stats[f"layer{stage}_{b}"] = blk_s
            b += 1
        stage += 1

    if num_classes is not None and "fc.weight" in sd:
        params["fc"] = {"kernel": sd["fc.weight"].T, "bias": sd["fc.bias"]}
    return {"params": params, "batch_stats": stats}
