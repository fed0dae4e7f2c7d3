"""LPAPS: LPIPS adapted to (1-channel) spectrograms.

Reference: specvqgan/modules/losses/lpaps.py — a VGG16 trunk with 1-channel
input pretrained on VGGSound ("vggishish16"), a frequency-wise
shift/scale layer, and learned 1×1 "lin" heads over the five ReLU slices
(relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 → 64/128/256/512/512 ch).

Distance: per slice, channel-unit-normalize both features, squared
difference, 1×1 lin head, spatial mean, sum over slices.

The pretrained weights auto-download in the reference
(specvqgan/utils.py:7-23); hermetic environments must pass the file —
otherwise random init (training still runs; perceptual term is then a
random-projection feature distance, flagged by ``pretrained=False``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

SLICE_CHANNELS = (64, 128, 256, 512, 512)
SLICE_LAYERS = ((0, 2), (2, 4), (4, 7), (7, 10), (10, 13))  # conv indices per slice
VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
             512, 512, 512)


class Vggishish16(nn.Module):
    """VGG16 feature trunk with 1-channel input; returns the 5 ReLU slices."""

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        slices = []
        conv_i = 0
        slice_ends = {2: 0, 4: 1, 7: 2, 10: 3, 13: 4}
        for item in VGG16_CFG:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(item, (3, 3), name=f"conv_{conv_i}")(x)
            x = nn.relu(x)
            conv_i += 1
            if conv_i in slice_ends:
                slices.append(x)
        return slices


class LPAPS(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """x, y: (B, H, W, 1) scaled spectrograms → perceptual distance (B,)."""
        shift = self.param("shift", nn.initializers.zeros, (1, 1, 1, 1))
        scale = self.param("scale", nn.initializers.ones, (1, 1, 1, 1))
        trunk = Vggishish16(name="net")

        def prep(t):
            return (t - shift) / scale

        fx = trunk(prep(x))
        fy = trunk(prep(y))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            diff = (a - b) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}")(diff)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total


def convert_lpaps(vgg_state: dict, lin_state: Optional[dict] = None) -> dict:
    """Map vggishish16.pt (+ lpaps lin weights) onto :class:`LPAPS`."""
    from syncfusion_tpu.core.checkpoint import t_conv2d

    params: dict = {"net": {}}
    conv_keys = [k for k in sorted(vgg_state) if k.endswith(".weight") and
                 vgg_state[k].ndim == 4]

    def layer_num(k):
        return int(k.split(".")[1]) if k.split(".")[0] == "features" else 0

    conv_keys = sorted(conv_keys, key=layer_num)
    for i, k in enumerate(conv_keys[: len([c for c in VGG16_CFG if c != "M"])]):
        params["net"][f"conv_{i}"] = {
            "kernel": t_conv2d(np.asarray(vgg_state[k])),
            "bias": np.asarray(vgg_state[k.replace("weight", "bias")]),
        }
    params["shift"] = np.zeros((1, 1, 1, 1), np.float32)
    params["scale"] = np.ones((1, 1, 1, 1), np.float32)
    if lin_state:
        for i in range(5):
            for cand in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
                if cand in lin_state:
                    params[f"lin{i}"] = {
                        "kernel": t_conv2d(np.asarray(lin_state[cand]))
                    }
                    break
        shift_key = "scaling_layer.shift"
        if shift_key in lin_state:
            params["shift"] = np.asarray(lin_state[shift_key]).reshape(1, 1, 1, 1)
            params["scale"] = np.asarray(lin_state["scaling_layer.scale"]).reshape(
                1, 1, 1, 1
            )
    return {"params": params}
