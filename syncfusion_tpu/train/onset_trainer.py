"""Onset model training: pos-weighted BCE + metrics + BN-aware train step.

Loss and metrics reproduce the reference ``BCLoss`` exactly
(main/module_onset.py:268-353):
  * pos-weighted BCE-with-logits, ``pos_weight = (N − Σy)/Σy`` per batch
  * AP on a positives/negatives-balanced subsample (sklearn)
  * binary accuracy at threshold 0.75 on sigmoid probs
  * "OnsNumAcc": fraction of chunks whose predicted onset count — after the
    reference's exact consecutive-onset zeroing loop — equals the target
    count.

The jittable parts (loss) are JAX; the sklearn/numpy metrics stay host-side
exactly like the reference (they're per-step CPU metrics there too).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from syncfusion_tpu.core.mesh import DATA_AXIS
from syncfusion_tpu.models.onset_net import VideoOnsetNet
from syncfusion_tpu.train.diffusion_trainer import OptimizerConfig, make_optimizer

THRESHOLD = 0.75  # reference main/module_onset.py:272


def bc_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Pos-weighted BCE-with-logits (reference BCLoss.forward:274-286)."""
    x = logits.reshape(-1)
    y = targets.reshape(-1).astype(jnp.float32)
    pos = jnp.sum(y)
    pos_weight = (y.shape[0] - pos) / jnp.maximum(pos, 1.0)
    # torch BCEWithLogitsLoss(pos_weight=w):
    #   l = -[w·y·log σ(x) + (1−y)·log(1−σ(x))], mean over elements
    log_sig = jax.nn.log_sigmoid(x)
    log_one_minus = jax.nn.log_sigmoid(-x)
    losses = -(pos_weight * y * log_sig + (1.0 - y) * log_one_minus)
    return jnp.mean(losses)


def _collapse_consecutive(pred: np.ndarray) -> np.ndarray:
    """The reference's exact sequential consecutive-onset zeroing
    (module_onset.py:344-347): runs of 1s become alternating 1,0,1,0,..."""
    pred = pred.copy()
    for i in range(pred.shape[0]):
        row = pred[i]
        for j in range(row.shape[-1] - 1):
            if row[j] == 1 and row[j + 1] == 1:
                row[j + 1] = 0
    return pred


def onset_metrics(logits: np.ndarray, targets: np.ndarray) -> dict[str, float]:
    """Host-side AP / Acc / OnsNumAcc (reference BCLoss.evaluate:288-353)."""
    from sklearn.metrics import average_precision_score

    probs2d = 1.0 / (1.0 + np.exp(-np.asarray(logits, np.float64)))
    targets2d = np.asarray(targets)

    # OnsNumAcc on the 2-D (chunk, frame) layout
    binarized = (probs2d > THRESHOLD).astype(int)
    collapsed = _collapse_consecutive(binarized)
    ons_num_acc = float(
        np.mean(collapsed.sum(axis=-1) == targets2d.astype(int).sum(axis=-1))
    )

    pred = probs2d.reshape(-1)
    target = targets2d.reshape(-1)
    pos_index = np.nonzero(target == 1)[0]
    neg_index = np.nonzero(target == 0)[0]
    balance = min(pos_index.shape[0], neg_index.shape[0])
    index = np.concatenate((pos_index[:balance], neg_index[:balance]))
    pred, target = pred[index], target[index]

    ap = float(average_precision_score(target, pred)) if balance else float("nan")
    binary = (pred > THRESHOLD).astype(np.float64)
    acc = float(np.sum(binary == target) / max(target.shape[0], 1))
    return {"AP": ap, "Acc": acc, "OnsNumAcc": ons_num_acc}


# --------------------------------------------------------------------------
# Trainer
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OnsetTrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


class OnsetTrainer:
    """AdamW trainer for :class:`VideoOnsetNet` (reference recipe:
    cfg/model/model-onset.yaml — lr 1e-4, betas (0.9, 0.999), wd 1e-3)."""

    def __init__(
        self,
        model: Optional[VideoOnsetNet] = None,
        opt_cfg: Optional[OptimizerConfig] = None,
        mesh: Optional[Mesh] = None,
        jitter: Optional[tuple] = None,
    ):
        """``jitter=(brightness, contrast, saturation, hue)`` enables the
        on-device ColorJitter augment inside the jitted train step (the
        reference's host-side torchvision jitter was the augment recipe's
        throughput killer — cfg/data/data-onset-greatesthit-augment.yaml,
        hot loop main/dataset_onset.py:152-165; docs/REHEARSAL.md §3b)."""
        self.model = model or VideoOnsetNet()
        self.opt_cfg = opt_cfg or OptimizerConfig(
            lr_beta1=0.9, gradient_clip_val=1e9, accumulate_grad_batches=1
        )
        self.tx = make_optimizer(self.opt_cfg)
        self.jitter = tuple(jitter) if jitter else None

        if mesh is not None:
            replicated = NamedSharding(mesh, P())
            sharded = NamedSharding(mesh, P(DATA_AXIS))
            self.train_step = jax.jit(
                self._train_step,
                in_shardings=(replicated, sharded, replicated),
                out_shardings=(replicated, replicated, replicated),
                donate_argnums=(0,),
            )
            self.forward = jax.jit(
                self._forward,
                in_shardings=(replicated, sharded),
                out_shardings=sharded,
            )
        else:
            self.train_step = jax.jit(self._train_step, donate_argnums=(0,))
            self.forward = jax.jit(self._forward)

    def init(self, key: jax.Array, frames_shape=(1, 30, 112, 112, 3)) -> OnsetTrainState:
        def _init(key):
            variables = self.model.init(key, jnp.zeros(frames_shape), train=False)
            return variables["params"], variables.get("batch_stats", {})

        params, batch_stats = jax.jit(_init)(key)
        return OnsetTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
        )

    @staticmethod
    def _yuv420_to_rgb(packed: jax.Array) -> jax.Array:
        """Packed planar 4:2:0 uint8 ``(B, T, H+H//2, W)`` → RGB [0,1]
        ``(B, T, H, W, 3)`` — inverse of transforms.rgb_to_yuv420, run
        on device inside the jitted step (chroma upsample is a cheap
        nearest-neighbor repeat; XLA fuses the 3×3 color matrix into the
        stem conv's input)."""
        Hp, W = packed.shape[-2], packed.shape[-1]
        H = Hp * 2 // 3
        f = packed.astype(jnp.float32) / 255.0
        y = f[..., :H, :]
        uv = f[..., H:, :]
        pb = uv[..., :, : W // 2] - 0.5
        pr = uv[..., :, W // 2:] - 0.5
        pb = jnp.repeat(jnp.repeat(pb, 2, axis=-1), 2, axis=-2)
        pr = jnp.repeat(jnp.repeat(pr, 2, axis=-1), 2, axis=-2)
        r = y + 1.402 * pr
        b = y + 1.772 * pb
        g = (y - 0.299 * r - 0.114 * b) / 0.587
        return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)

    @staticmethod
    def _decode_wire(frames: jax.Array):
        """Wire format → RGB [0,1] on device, or None if the input is
        already normalized float (host-side Normalize).

        Discriminated structurally: RGB wires carry a trailing channel dim
        of 3; the packed YUV 4:2:0 wire has none (its trailing dim is the
        frame width, never 3).  uint8 + channels = raw RGB pixels (4× less
        than float), uint8 without = packed 4:2:0 (8× less), float =
        normalized passthrough."""
        if frames.dtype == jnp.uint8 and frames.shape[-1] != 3:
            return OnsetTrainer._yuv420_to_rgb(frames)
        if frames.dtype == jnp.uint8:
            return frames.astype(jnp.float32) / 255.0
        return None

    @staticmethod
    def _prep_frames(frames: jax.Array) -> jax.Array:
        """Wire format → ImageNet-normalized float ON DEVICE.

        Counterpart of ``FrameTransform(wire_uint8=True / wire_yuv420=True)``:
        the host ships quantized pixels (4× / 8× less H2D traffic than
        normalized float) and the decode+normalize runs inside the jitted
        step, where XLA fuses it into the first conv's input.  Float inputs
        are already normalized host-side and pass through."""
        f = OnsetTrainer._decode_wire(frames)
        if f is None:
            return frames
        from syncfusion_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

        return (f - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

    def _train_frames(self, frames: jax.Array, key) -> jax.Array:
        """Train-time frame prep: wire decode → [0,1] float, on-device
        ColorJitter (when configured), ImageNet normalize — all in-jit."""
        if self.jitter is None:
            return self._prep_frames(frames)
        # float inputs are already ImageNet-NORMALIZED host-side
        # (FrameTransform.finish) — jittering them as [0,1] pixels would be
        # garbage; the device-jitter path requires a quantized wire format.
        f = self._decode_wire(frames)
        assert f is not None, (
            "OnsetTrainer(jitter=...) needs a quantized frame wire "
            "(FrameTransform(wire_uint8=True or wire_yuv420=True, "
            f"device_jitter=True)); got float {frames.dtype}"
        )
        from syncfusion_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
        from syncfusion_tpu.ops.augment import color_jitter_device

        f = color_jitter_device(f, key, *self.jitter)
        return (f - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

    def _loss(self, params, batch_stats, batch, key):
        logits, mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            self._train_frames(batch["frames"], key),
            train=True,
            mutable=["batch_stats"],
        )
        return bc_loss(logits, batch["label"]), (logits, mutated["batch_stats"])

    def _train_step(self, state: OnsetTrainState, batch: dict, seed):
        """``seed``: uint32 scalar (or typed key) for the on-device augment;
        the key is built in-jit (ensure_key) like the other trainers —
        zero eager device ops per step."""
        from syncfusion_tpu.train.diffusion_trainer import ensure_key

        key = ensure_key(seed)
        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            self._loss, has_aux=True
        )(state.params, state.batch_stats, batch, key)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = OnsetTrainState(
            step=state.step + 1, params=params,
            batch_stats=new_stats, opt_state=opt_state,
        )
        return new_state, {"loss/train": loss}, logits

    def _forward(self, state: OnsetTrainState, frames: jax.Array) -> jax.Array:
        return self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            self._prep_frames(frames),
            train=False,
        )
