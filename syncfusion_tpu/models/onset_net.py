"""Video onset-detection network: R(2+1)D-18 with keep-temporal surgery.

Re-design of the reference onset model (main/onset_net.py:12-63 +
main/resnet.py): an R(2+1)D-18 video CNN whose temporal stride is forced to
1 everywhere so a 2-second 30-frame chunk yields 30 per-frame onset logits.

Geometry reproduced exactly (validated in tests/test_onset_net.py):
  * stem: (1,7,7) conv 3→45 stride (1,2,2) → BN → ReLU → (3,1,1) conv
    45→64 → BN → ReLU                        (main/resnet.py:177-192)
  * 4 stages of 2 BasicBlocks at 64/128/256/512 channels; each factored
    conv is (1,3,3) spatial → BN → ReLU → (3,1,1) temporal with torchvision
    midplanes  M = ⌊(Cin·Cout·27)/(Cin·9 + 3·Cout)⌋ — giving the 230/460/921
    mid-widths the reference surgery re-creates (main/onset_net.py:19-36)
  * ALL strides are spatial-only (1,2,2): the "KeepTemp" surgery
  * head: global HW mean (T kept) → Linear 512→128 → ReLU → Linear 128→1
    (main/onset_net.py:46-63)

Layout: inputs are channels-last ``(B, T, H, W, 3)`` (TPU native); the
reference's ``(B, 3, T, H, W)`` is transposed at the data edge.

BatchNorm note: under jit+GSPMD the batch statistics are computed over the
GLOBAL (mesh-wide) batch by construction, which is exactly the reference's
``sync_batchnorm=True`` (script/train_onset_model.py:22) without any
explicit cross-replica code.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def midplanes(c_in: int, c_out: int) -> int:
    """torchvision's (2+1)D factorization width (resnet.py:97-99 semantics)."""
    return (c_in * c_out * 3 * 3 * 3) // (c_in * 3 * 3 + 3 * c_out)


class Conv2Plus1D(nn.Module):
    """(1,3,3) spatial conv → BN → ReLU → (3,1,1) temporal conv.

    ``stride`` applies spatially only (keep-temporal surgery is the default
    and only mode here — the reference patches torchvision to get this)."""

    out_planes: int
    mid_planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # explicit torch-style symmetric padding: XLA SAME pads
        # asymmetrically under stride>1, which would shift imported weights
        x = nn.Conv(
            self.mid_planes, (1, 3, 3), strides=(1, self.stride, self.stride),
            padding=((0, 0), (1, 1), (1, 1)),
            use_bias=False, dtype=self.dtype, name="spatial",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.out_planes, (3, 1, 1), strides=(1, 1, 1),
            padding=((1, 1), (0, 0), (0, 0)),
            use_bias=False, dtype=self.dtype, name="temporal",
        )(x)
        return x


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_planes = x.shape[-1]
        residual = x
        # One midplanes per block, shared by both convs (reference
        # main/resnet.py:86-97 computes it once from (inplanes, planes)).
        mid = midplanes(in_planes, self.planes)

        h = Conv2Plus1D(self.planes, mid, stride=self.stride,
                        dtype=self.dtype, name="conv1")(x, train)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(h)
        h = nn.relu(h)
        h = Conv2Plus1D(self.planes, mid, dtype=self.dtype, name="conv2")(h, train)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(h)

        if self.stride != 1 or in_planes != self.planes:
            residual = nn.Conv(
                self.planes, (1, 1, 1), strides=(1, self.stride, self.stride),
                padding="VALID", use_bias=False, dtype=self.dtype,
                name="downsample_conv",
            )(residual)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, name="downsample_bn")(residual)
        return nn.relu(h + residual)


class R2Plus1D18KeepTemp(nn.Module):
    """Backbone → (B, T, 512) per-frame features."""

    layers: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # Stem (R2Plus1dStem, spatial stride 2)
        x = nn.Conv(45, (1, 7, 7), strides=(1, 2, 2),
                    padding=((0, 0), (3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="stem_spatial")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="stem_bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    use_bias=False, dtype=self.dtype, name="stem_temporal")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="stem_bn2")(x)
        x = nn.relu(x)

        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers), start=1
        ):
            for b in range(blocks):
                stride = 2 if (stage > 1 and b == 0) else 1
                x = BasicBlock(planes, stride=stride, dtype=self.dtype,
                               name=f"layer{stage}_{b}")(x, train)

        # AdaptiveAvgPool3d((None, 1, 1)): mean over H, W; keep T
        return jnp.mean(x, axis=(2, 3))


class VideoOnsetNet(nn.Module):
    """Full onset net: (B, T, H, W, 3) → per-frame logits (B, T).

    ``layers`` controls blocks per stage ((2,2,2,2) = the reference's
    R(2+1)D-18; (1,1,1,1) gives a lighter R(2+1)D-10 variant)."""

    layers: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feats = R2Plus1D18KeepTemp(layers=self.layers, dtype=self.dtype,
                                   name="backbone")(x, train)
        h = nn.Dense(128, name="fc1")(feats)
        h = nn.relu(h)
        h = nn.Dense(1, name="fc2")(h)
        return h[..., 0]


# --------------------------------------------------------------------------
# torchvision/Kinetics weight import
# --------------------------------------------------------------------------

def convert_torch_r2plus1d(state_dict: dict[str, np.ndarray]) -> dict:
    """Map a torchvision ``r2plus1d_18`` (or reference VideoOnsetNet)
    state_dict onto this module's parameter tree.

    Accepts either bare backbone keys (``stem.0.weight``...) or the
    reference's prefixed ones (``model.net.model.stem.0.weight`` /
    ``net.model.stem...``).  Returns ``{"params": ..., "batch_stats": ...}``
    ready for ``VideoOnsetNet.apply`` when head weights are present, else a
    backbone-only tree.
    """
    from syncfusion_tpu.core.checkpoint import t_conv3d

    sd = {}
    for k, v in state_dict.items():
        for prefix in ("model.net.model.", "net.model.", "model.", ""):
            if k.startswith(prefix):
                sd[k[len(prefix):]] = np.asarray(v)
                break

    params: dict = {"backbone": {}}
    stats: dict = {"backbone": {}}
    bb_p, bb_s = params["backbone"], stats["backbone"]

    def put_bn(dst_p: dict, dst_s: dict, name: str, src: str):
        dst_p[name] = {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]}
        dst_s[name] = {
            "mean": sd[f"{src}.running_mean"], "var": sd[f"{src}.running_var"]
        }

    # stem: [conv, bn, relu, conv, bn, relu] indices 0,1,3,4
    bb_p["stem_spatial"] = {"kernel": t_conv3d(sd["stem.0.weight"])}
    put_bn(bb_p, bb_s, "stem_bn1", "stem.1")
    bb_p["stem_temporal"] = {"kernel": t_conv3d(sd["stem.3.weight"])}
    put_bn(bb_p, bb_s, "stem_bn2", "stem.4")

    for stage in range(1, 5):
        for b in range(2):
            src = f"layer{stage}.{b}"
            blk_p, blk_s = {}, {}
            for ci in (1, 2):
                # torch Conv2Plus1D is Sequential [conv, bn, relu, conv]
                conv_p, conv_s = {}, {}
                conv_p["spatial"] = {
                    "kernel": t_conv3d(sd[f"{src}.conv{ci}.0.0.weight"])
                }
                put_bn(conv_p, conv_s, "bn", f"{src}.conv{ci}.0.1")
                conv_p["temporal"] = {
                    "kernel": t_conv3d(sd[f"{src}.conv{ci}.0.3.weight"])
                }
                blk_p[f"conv{ci}"], blk_s[f"conv{ci}"] = conv_p, conv_s
                put_bn(blk_p, blk_s, f"bn{ci}", f"{src}.conv{ci}.1")
            if f"{src}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": t_conv3d(sd[f"{src}.downsample.0.weight"])
                }
                put_bn(blk_p, blk_s, "downsample_bn", f"{src}.downsample.1")
            bb_p[f"layer{stage}_{b}"] = blk_p
            bb_s[f"layer{stage}_{b}"] = blk_s

    # Optional onset head (reference fc.0 / fc.2, main/onset_net.py:51-55)
    for idx, name in ((0, "fc1"), (2, "fc2")):
        for cand in (f"fc.{idx}.weight", f"model.fc.{idx}.weight"):
            if cand in sd:
                params[name] = {
                    "kernel": sd[cand].T,
                    "bias": sd[cand.replace("weight", "bias")],
                }
                break

    return {"params": params, "batch_stats": stats}
