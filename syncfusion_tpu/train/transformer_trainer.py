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
    ):
        self.model = model
        self.tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(
                learning_rate, b1=betas[0], b2=betas[1],
                weight_decay=weight_decay, mask=decay_mask,
            ),
        )
        self.train_step = jax.jit(self._train_step, donate_argnums=(0,))
        self.eval_step = jax.jit(self._eval_step)

    def create_state(self, full_params: dict) -> GPTTrainState:
        return GPTTrainState(
            step=jnp.zeros((), jnp.int32),
            gpt_params=full_params["gpt"],
            opt_state=self.tx.init(full_params["gpt"]),
        )

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
