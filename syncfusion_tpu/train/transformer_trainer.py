"""AV-conditional GPT trainer (CondFoleyGen stage 2).

Optimizer reproduces minGPT's parameter grouping (reference
av_cond_transformer.py configure_optimizers:504-551): AdamW with betas
(0.9, 0.95) and weight decay applied ONLY to matmul kernels — biases,
norms, embeddings and the positional table are decay-free.  First-stage VQ
and video-net params are frozen (not in the train state).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from syncfusion_tpu.models.transformer_av import AVCondTransformer


def decay_mask(params: Any) -> Any:
    """True (decay) for Dense/conv kernels; False for everything else."""

    def mask_fn(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return name == "kernel"

    return jax.tree_util.tree_map_with_path(mask_fn, params)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GPTTrainState:
    step: jax.Array
    gpt_params: Any
    opt_state: Any


class TransformerTrainer:
    def __init__(
        self,
        model: AVCondTransformer,
        learning_rate: float = 1e-4,
        weight_decay: float = 0.01,
        betas: tuple[float, float] = (0.9, 0.95),
        grad_clip: float = 1.0,
        mesh=None,
        fsdp: bool = False,
        fsdp_min_size: int = 2**14,
    ):
        self.model = model
        self.tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(
                learning_rate, b1=betas[0], b2=betas[1],
                weight_decay=weight_decay, mask=decay_mask,
            ),
        )
        # mesh → DP over `data`; fsdp additionally shards GPT params, Adam
        # state AND the frozen first-stage/video params over `model`
        # (core/mesh.fsdp_param_specs — the 300M GPT + 100M frozen stack is
        # the repo's largest memory footprint).  Single-device path is the
        # plain jit the reference recipe uses.
        from syncfusion_tpu.core.mesh import MODEL_AXIS

        self.mesh = mesh
        self.fsdp = fsdp and mesh is not None and mesh.shape.get(MODEL_AXIS, 1) > 1
        self.fsdp_min_size = fsdp_min_size
        if mesh is not None:
            from syncfusion_tpu.train.sharding import ShardedStep

            self.train_step = ShardedStep(
                self._train_step, mesh, ("carried", "carried", "batch", "repl"),
                out="carry_metrics", donate_carry=True,
            )
            self.eval_step = ShardedStep(
                self._eval_step, mesh, ("carried", "carried", "batch")
            )
        else:
            self.train_step = jax.jit(self._train_step, donate_argnums=(0,))
            self.eval_step = jax.jit(self._eval_step)

    def create_state(self, full_params: dict) -> GPTTrainState:
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from syncfusion_tpu.core.mesh import (
                fsdp_init_opt, replicate_tree, shard_params,
            )

            if self.fsdp:
                gpt = shard_params(full_params["gpt"], self.mesh,
                                   min_size=self.fsdp_min_size)
                opt = fsdp_init_opt(
                    self.tx, gpt, self.mesh, min_size=self.fsdp_min_size
                )
            else:
                # Non-FSDP mesh: params AND Adam state replicated —
                # sharding only the optimizer would force per-step
                # all-gathers of mu/nu against replicated params.
                gpt = replicate_tree(full_params["gpt"], self.mesh)
                opt = jax.jit(
                    self.tx.init,
                    out_shardings=NamedSharding(self.mesh, P()),
                )(gpt)
            return GPTTrainState(
                step=jax.device_put(jnp.zeros((), jnp.int32),
                                    NamedSharding(self.mesh, P())),
                gpt_params=gpt,
                opt_state=opt,
            )
        return GPTTrainState(
            step=jnp.zeros((), jnp.int32),
            gpt_params=full_params["gpt"],
            opt_state=self.tx.init(full_params["gpt"]),
        )

    def place_frozen(self, frozen: dict) -> dict:
        """Place the frozen first-stage/video params for the mesh mode:
        FSDP-sharded over `model` when enabled (they are all-gathered around
        use like trainables, ~1/tp resident HBM), replicated otherwise."""
        if self.mesh is None:
            return frozen
        from syncfusion_tpu.core.mesh import replicate_tree, shard_params

        if self.fsdp:
            return shard_params(frozen, self.mesh, min_size=self.fsdp_min_size)
        return replicate_tree(frozen, self.mesh)

    def _loss(self, gpt_params, frozen, batch, key):
        params = {**frozen, "gpt": gpt_params}
        return self.model.loss(
            params, batch["spec"], batch["cond_spec"], batch["frames"], key
        )

    def _train_step(self, state: GPTTrainState, frozen: dict, batch: dict,
                    key: jax.Array):
        from syncfusion_tpu.train.diffusion_trainer import ensure_key

        loss, grads = jax.value_and_grad(self._loss)(
            state.gpt_params, frozen, batch, ensure_key(key)
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.gpt_params)
        gpt_params = optax.apply_updates(state.gpt_params, updates)
        return (
            GPTTrainState(step=state.step + 1, gpt_params=gpt_params,
                          opt_state=opt_state),
            {"train/loss": loss},
        )

    def _eval_step(self, state: GPTTrainState, frozen: dict, batch: dict):
        loss = self._loss(state.gpt_params, frozen, batch, None)
        return {"val/loss": loss}
