"""Two-optimizer VQ-GAN training (reference VQLPAPSWithDiscriminator +
VQModel.training_step, specvqgan/modules/losses/vqperceptual.py:39-166).

Per step (alternating-optimizer semantics folded into one jitted step over
the same batch, like Lightning's optimizer_idx loop):
  G: L1 recon + perceptual_weight·LPAPS + adaptive_d_weight·disc_factor·
     (−mean D(fake)) + codebook_weight·q_loss      → Adam(lr, β=(0.5, 0.9))
  D: hinge 0.5·[mean relu(1−D(real)) + mean relu(1+D(fake))]
Disc warm-start: disc_factor = 0 until step ≥ disc_start (GH: 30001).

Adaptive weight = ‖∇_last nll‖ / (‖∇_last g‖ + 1e-4) clamped to
[min_adapt, max_adapt] — the GH config clamps to [1,1]
(greatesthit_codebook.yaml:72-74), in which case the double backward is
skipped entirely (a TPU win the reference cannot take).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from syncfusion_tpu.models.vqgan.discriminator import NLayerDiscriminator
from syncfusion_tpu.models.vqgan.lpaps import LPAPS
from syncfusion_tpu.models.vqgan.model import VQModel


@dataclasses.dataclass
class VQGANLossConfig:
    disc_start: int = 30001
    disc_weight: float = 0.8
    codebook_weight: float = 1.0
    perceptual_weight: float = 1.0
    min_adapt_weight: float = 1.0
    max_adapt_weight: float = 1.0
    disc_factor: float = 1.0


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - logits_real))
        + jnp.mean(jax.nn.relu(1.0 + logits_fake))
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VQGANTrainState:
    step: jax.Array
    params: Any          # VQModel params
    disc_params: Any
    disc_stats: Any      # discriminator BN stats
    opt_state_g: Any
    opt_state_d: Any


class VQGANTrainer:
    def __init__(
        self,
        model: Optional[VQModel] = None,
        loss_cfg: Optional[VQGANLossConfig] = None,
        learning_rate: float = 4.5e-6,
        lpaps_params: Optional[dict] = None,
        discriminator: Optional[NLayerDiscriminator] = None,
    ):
        self.model = model or VQModel()
        self.cfg = loss_cfg or VQGANLossConfig()
        self.disc = discriminator or NLayerDiscriminator()
        self.lpaps = LPAPS()
        self.lpaps_params = lpaps_params  # None → perceptual term off
        self.tx_g = optax.adam(learning_rate, b1=0.5, b2=0.9)
        self.tx_d = optax.adam(learning_rate, b1=0.5, b2=0.9)
        self.train_step = jax.jit(self._train_step, donate_argnums=(0,))
        self.eval_step = jax.jit(self._eval_step)

    def init(self, key: jax.Array, spec_shape=(1, 80, 160, 1)) -> VQGANTrainState:
        k1, k2, k3 = jax.random.split(key, 3)

        def _init():
            params = self.model.init(k1, jnp.zeros(spec_shape))
            dvars = self.disc.init(k2, jnp.zeros(spec_shape), train=False)
            return params, dvars

        params, dvars = jax.jit(_init)()
        patch = jax.eval_shape(
            lambda v: self.disc.apply(v, jnp.zeros(spec_shape), train=False), dvars
        )
        if 0 in patch.shape:
            raise ValueError(
                f"discriminator collapses {spec_shape} to empty patch grid "
                f"{patch.shape}; use fewer n_layers for this resolution"
            )
        if self.lpaps_params is None:
            self.lpaps_params = jax.jit(
                lambda: self.lpaps.init(
                    k3, jnp.zeros(spec_shape), jnp.zeros(spec_shape)
                )
            )()
        return VQGANTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            disc_params=dvars["params"],
            disc_stats=dvars.get("batch_stats", {}),
            opt_state_g=self.tx_g.init(params),
            opt_state_d=self.tx_d.init(dvars["params"]),
        )

    # ------------------------------------------------------------------
    def _recon_loss(self, x, xrec):
        rec = jnp.abs(x - xrec)
        if self.cfg.perceptual_weight > 0:
            p = self.lpaps.apply(self.lpaps_params, x, xrec)
            rec = rec + self.cfg.perceptual_weight * p[:, None, None, None]
        return jnp.mean(rec)

    def _g_loss(self, params, disc_params, disc_stats, x, disc_factor):
        xrec, qloss, info = self.model.apply(params, x)
        nll = self._recon_loss(x, xrec)
        logits_fake = self.disc.apply(
            {"params": disc_params, "batch_stats": disc_stats}, xrec, train=False
        )
        g = -jnp.mean(logits_fake)
        # GH config clamps the adaptive weight to [1, 1] → constant
        d_weight = self.cfg.min_adapt_weight \
            if self.cfg.min_adapt_weight == self.cfg.max_adapt_weight \
            else self._adaptive_weight(params, disc_params, disc_stats, x)
        loss = (
            nll
            + d_weight * self.cfg.disc_weight * disc_factor * g
            + self.cfg.codebook_weight * qloss
        )
        metrics = {
            "loss/g_total": loss,
            "loss/nll": nll,
            "loss/quant": qloss,
            "loss/g": g,
            "perplexity": info["perplexity"],
        }
        return loss, (xrec, metrics)

    def _adaptive_weight(self, params, disc_params, disc_stats, x):
        """‖∇_last nll‖/‖∇_last g‖ w.r.t. the decoder's final conv kernel
        (reference calculate_adaptive_weight, vqperceptual.py:84-95)."""

        def with_last(last):
            p = jax.tree_util.tree_map(lambda v: v, params)
            p["params"]["decoder"]["conv_out"]["kernel"] = last
            xrec, _, _ = self.model.apply(p, x)
            return xrec

        def nll_of_last(last):
            return self._recon_loss(x, with_last(last))

        def g_of_last(last):
            logits = self.disc.apply(
                {"params": disc_params, "batch_stats": disc_stats},
                with_last(last), train=False,
            )
            return -jnp.mean(logits)

        last = params["params"]["decoder"]["conv_out"]["kernel"]
        n1 = jnp.linalg.norm(jax.grad(nll_of_last)(last))
        n2 = jnp.linalg.norm(jax.grad(g_of_last)(last))
        w = n1 / (n2 + 1e-4)
        return jax.lax.stop_gradient(
            jnp.clip(w, self.cfg.min_adapt_weight, self.cfg.max_adapt_weight)
        )

    def _train_step(self, state: VQGANTrainState, spec: jax.Array):
        disc_factor = jnp.where(
            state.step >= self.cfg.disc_start, self.cfg.disc_factor, 0.0
        )

        # ---- G update -------------------------------------------------
        (g_total, (xrec, metrics)), grads = jax.value_and_grad(
            self._g_loss, has_aux=True
        )(state.params, state.disc_params, state.disc_stats, spec, disc_factor)
        updates, opt_g = self.tx_g.update(grads, state.opt_state_g, state.params)
        params = optax.apply_updates(state.params, updates)

        # ---- D update: trains on the PRE-update G's reconstruction
        # (detached), matching the reference's Lightning optimizer
        # alternation — both optimizer_idx branches see the same batch's
        # forward (specvqgan/models/vqgan.py:140-222). ----------------
        def d_loss_fn(disc_params):
            logits_real, mut = self.disc.apply(
                {"params": disc_params, "batch_stats": state.disc_stats},
                spec, train=True, mutable=["batch_stats"],
            )
            logits_fake, mut2 = self.disc.apply(
                {"params": disc_params, "batch_stats": mut["batch_stats"]},
                jax.lax.stop_gradient(xrec), train=True, mutable=["batch_stats"],
            )
            return disc_factor * hinge_d_loss(logits_real, logits_fake), mut2[
                "batch_stats"
            ]

        (d_loss, disc_stats), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.disc_params
        )
        d_updates, opt_d = self.tx_d.update(d_grads, state.opt_state_d, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        metrics["loss/disc"] = d_loss
        new_state = VQGANTrainState(
            step=state.step + 1, params=params, disc_params=disc_params,
            disc_stats=disc_stats, opt_state_g=opt_g, opt_state_d=opt_d,
        )
        return new_state, metrics

    def _eval_step(self, state: VQGANTrainState, spec: jax.Array):
        xrec, qloss, info = self.model.apply(state.params, spec)
        # codebook-usage histogram (reference VQModel codebook logging,
        # vqgan.py:267-292): per-code counts + fraction of codes in use
        counts = jnp.bincount(
            info["indices"].reshape(-1), length=self.model.n_embed
        )
        return {
            "val/rec_loss": jnp.mean(jnp.abs(spec - xrec)),
            "val/quant_loss": qloss,
            "val/perplexity": info["perplexity"],
            "val/codebook_usage": jnp.mean((counts > 0).astype(jnp.float32)),
            "val/code_counts": counts,
        }
