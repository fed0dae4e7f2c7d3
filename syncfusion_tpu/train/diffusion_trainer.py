"""v-diffusion trainer: AdamW + grad-accumulation + clipping, DP over mesh.

Optimization recipe matches the reference exactly (exp/model/diffusion.yaml:
5-9 and exp/train_diffusion_gh.yaml:92-93): AdamW lr 1e-4, betas (0.95,
0.999), eps 1e-6, weight decay 1e-3, gradient clip 0.5, gradient
accumulation 2.  One optimizer over UNet + onsets-encoder params; the CLAP
embedder is frozen and lives outside the train state
(reference: main/module_diffusion.py:50-62).

Distribution: parameters/opt state replicated, batch sharded over the
``data`` mesh axis.  Gradients come out of ``jax.grad`` already averaged
across the global batch — XLA inserts the psum over ICI; there is no
explicit all-reduce anywhere (the DDP/NCCL equivalent, SURVEY §2.5).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from syncfusion_tpu.core.mesh import DATA_AXIS
from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion


@dataclasses.dataclass
class OptimizerConfig:
    lr: float = 1e-4
    lr_beta1: float = 0.95
    lr_beta2: float = 0.999
    lr_eps: float = 1e-6
    lr_weight_decay: float = 1e-3
    gradient_clip_val: float = 0.5
    accumulate_grad_batches: int = 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


def ensure_key(key: jax.Array) -> jax.Array:
    """Accept a typed PRNG key OR a raw uint32/int scalar seed.

    Drivers pass a host-side integer seed per step: building the key INSIDE
    the jitted step avoids one eager ``jax.random.split`` device round trip
    per step (~100 ms over the chip tunnel — it dominated the observed
    full-scale step time)."""
    if jnp.issubdtype(jnp.asarray(key).dtype, jax.dtypes.prng_key):
        return key
    return jax.random.key(key)


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_val),
        optax.adamw(
            learning_rate=cfg.lr,
            b1=cfg.lr_beta1,
            b2=cfg.lr_beta2,
            eps=cfg.lr_eps,
            weight_decay=cfg.lr_weight_decay,
        ),
    )
    if cfg.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_grad_batches)
    return tx


class DiffusionTrainer:
    """Owns the jitted train/eval steps for a :class:`SyncFusionDiffusion`."""

    def __init__(
        self,
        model: SyncFusionDiffusion,
        opt_cfg: OptimizerConfig | None = None,
        mesh: Optional[Mesh] = None,
        embedding_mask_proba: float = 0.0,
        fsdp: bool = False,
        fsdp_min_size: int = 2**14,
    ):
        self.model = model
        self.opt_cfg = opt_cfg or OptimizerConfig()
        self.tx = make_optimizer(self.opt_cfg)
        self.mesh = mesh
        self.embedding_mask_proba = embedding_mask_proba
        # fsdp: shard params/grads/opt-state over the mesh's `model` axis
        # (core.mesh.fsdp_param_specs — ZeRO-3/tensor-parallel hybrid under
        # GSPMD).  State shardings are then carried by the arrays themselves:
        # jit infers them from the committed inputs and optax.init/update
        # propagate them to mu/nu, so the step function is identical.
        self.fsdp = fsdp and mesh is not None and mesh.shape.get("model", 1) > 1
        self.fsdp_min_size = fsdp_min_size

        if self.fsdp:
            # Shardings depend on the param shapes, which aren't known until
            # create_state — ShardedStep jits lazily on first call with
            # explicit in/out state shardings read off the committed state.
            from syncfusion_tpu.train.sharding import ShardedStep

            self.train_step = ShardedStep(
                self._train_step, mesh, ("carried", "batch", "repl"),
                out="carry_metrics", donate_carry=True,
            )
            self.eval_step = ShardedStep(
                self._eval_step, mesh, ("carried", "batch", "repl")
            )
        elif mesh is not None:
            replicated = NamedSharding(mesh, P())
            batch_sharded = NamedSharding(mesh, P(DATA_AXIS))
            self.train_step = jax.jit(
                self._train_step,
                in_shardings=(replicated, batch_sharded, replicated),
                out_shardings=(replicated, replicated),
                donate_argnums=(0,),
            )
            self.eval_step = jax.jit(
                self._eval_step,
                in_shardings=(replicated, batch_sharded, replicated),
                out_shardings=replicated,
            )
        else:
            self.train_step = jax.jit(self._train_step, donate_argnums=(0,))
            self.eval_step = jax.jit(self._eval_step)

    # ------------------------------------------------------------------
    def create_state(self, params: Any) -> TrainState:
        if self.fsdp:
            from syncfusion_tpu.core.mesh import fsdp_init_opt, shard_params

            params = shard_params(params, self.mesh, min_size=self.fsdp_min_size)
            opt_state = fsdp_init_opt(self.tx, params, self.mesh,
                                      min_size=self.fsdp_min_size)
            step = jax.device_put(
                jnp.zeros((), jnp.int32), NamedSharding(self.mesh, P())
            )
            return TrainState(step=step, params=params, opt_state=opt_state)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
        )

    _ensure_key = staticmethod(ensure_key)

    def _loss(self, params, batch, key):
        # Wire formats (H2D is ~25 MB/s over the chip tunnel; dequantize on
        # device): int16 wav (opt-in, datamodule.wire_int16 — quantizes the
        # training target at -90 dBFS, exact when sources are 16-bit PCM)
        # and uint8 onsets (lossless — the track is binary).
        wav, onsets = batch["wav"], batch["onsets"]
        if wav.dtype == jnp.int16:
            wav = wav.astype(jnp.float32) / 32767.0
        if onsets.dtype == jnp.uint8:
            onsets = onsets.astype(jnp.float32)
        return self.model.loss(
            params,
            key,
            wav,
            onsets,
            batch.get("embedding"),
            embedding_mask_proba=self.embedding_mask_proba,
        )

    def _train_step(self, state: TrainState, batch: dict, key: jax.Array):
        key = self._ensure_key(key)
        loss, grads = jax.value_and_grad(self._loss)(state.params, batch, key)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, {"train_loss": loss}

    def _eval_step(self, state: TrainState, batch: dict, key: jax.Array):
        return {"valid_loss": self._loss(state.params, batch, self._ensure_key(key))}
