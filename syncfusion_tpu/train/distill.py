"""Progressive distillation of the v-diffusion sampler (few-step serving).

A capability beyond the reference: halve the sampler's step count
repeatedly by teaching a student to match TWO teacher DDIM steps with ONE
of its own (Salimans & Ho, "Progressive Distillation for Fast Sampling of
Diffusion Models", ICLR 2022 — re-derived for this repo's angle-space
v-sampler, models/diffusion.py).

In angle space the DDIM update is a pure rotation:

    x_psi = cos(psi - phi) * x + sin(psi - phi) * v_pred(x, phi)

so the one-step student target that reproduces the teacher's two-step
result x'' from x at angle phi is exactly

    v* = (x'' - cos(D) * x) / sin(D),   D = psi'' - phi.

Training samples x by forward-noising clean data at angles drawn from the
STUDENT's discrete step grid (the distilled model is only ever queried
there).  Each round halves num_steps; the student initializes from the
teacher.  Everything is jitted and DP-shardable exactly like
DiffusionTrainer (params replicated, batch sharded).

The distilled params drop into the normal serving path unchanged —
``model.sample(params, ..., num_steps=<few>)``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion


def _rotate(x: jax.Array, v: jax.Array, delta: jax.Array) -> jax.Array:
    return jnp.cos(delta) * x + jnp.sin(delta) * v


@dataclasses.dataclass
class DistillConfig:
    start_steps: int = 64          # teacher's sampler grid at round 0
    final_steps: int = 8           # stop when the student reaches this
    steps_per_round: int = 400     # optimizer steps per halving
    lr: float = 1e-4
    grad_clip: float = 0.5
    # != 1.0: guided distillation — the teacher's v is the CFG combine
    # v_u + (v_c - v_u)*scale (cond+uncond as one 2B batch, like v_sample),
    # baked into a single-forward student.  The distilled model is then
    # sampled with embedding_scale=1.0: no 2x CFG batch at serving.
    cfg_scale: float = 1.0


class ProgressiveDistiller:
    """Distills a trained SyncFusionDiffusion to fewer sampler steps."""

    def __init__(self, model: SyncFusionDiffusion, cfg: DistillConfig | None = None):
        self.model = model
        self.cfg = cfg or DistillConfig()
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.cfg.grad_clip),
            optax.adamw(self.cfg.lr, b1=0.9, b2=0.999, weight_decay=0.0),
        )

    # -- one distillation loss evaluation ------------------------------
    def loss(
        self,
        student_params: dict,
        teacher_params: dict,
        key: jax.Array,
        wav: jax.Array,
        onsets: jax.Array,
        embedding: Optional[jax.Array],
        num_student_steps: int,
    ) -> jax.Array:
        """MSE(v_student, v*) on the student's step grid.

        ``num_student_steps`` is the grid AFTER the halving (the teacher
        runs 2x as fine).  sigma grid: linspace(1, 0, N+1)[:-1] — the same
        discretization v_sample uses.
        """
        model = self.model
        k_i, k_noise, k_cfg = jax.random.split(key, 3)
        b = wav.shape[0]

        # student query angles: phi_i, i ~ U{0..N-1}; teacher runs
        # phi_i -> phi_{i+1/2} -> phi_{i+1} on its 2N grid.
        i = jax.random.randint(k_i, (b,), 0, num_student_steps)
        sig_now = 1.0 - i / num_student_steps
        sig_half = 1.0 - (i + 0.5) / num_student_steps
        sig_next = 1.0 - (i + 1.0) / num_student_steps
        half_pi = math.pi / 2
        phi_now = sig_now * half_pi
        phi_half = sig_half * half_pi
        phi_next = sig_next * half_pi

        def bc(t):
            return t.reshape(t.shape + (1,) * (wav.ndim - t.ndim))

        noise = jax.random.normal(k_noise, wav.shape, wav.dtype)
        x = jnp.cos(bc(phi_now)) * wav + jnp.sin(bc(phi_now)) * noise

        apply_fn = model._unet_apply()
        t_ctx = model.encode_context(teacher_params["encoder"], onsets)

        scale = self.cfg.cfg_scale
        if scale != 1.0 and embedding is not None:
            # guided teacher: CFG combine, cond+uncond folded into one 2B
            # forward exactly like v_sample (models/diffusion.py:87-108)
            def teacher_v(x, sigma):
                x2 = jnp.concatenate([x, x], axis=0)
                ctx2 = [jnp.concatenate([c, c], axis=0) for c in t_ctx]
                emb2 = jnp.concatenate([embedding, jnp.zeros_like(embedding)], axis=0)
                mask = jnp.concatenate(
                    [jnp.zeros((x.shape[0], 1, 1)), jnp.ones((x.shape[0], 1, 1))],
                    axis=0,
                )
                v2 = apply_fn(
                    teacher_params["unet"], x2, jnp.concatenate([sigma, sigma]),
                    context=ctx2, embedding=emb2, embedding_cfg_mask=mask,
                )
                v_c, v_u = jnp.split(v2, 2, axis=0)
                return v_u + (v_c - v_u) * scale
        else:
            def teacher_v(x, sigma):
                return apply_fn(
                    teacher_params["unet"], x, sigma, context=t_ctx,
                    embedding=embedding,
                )

        # two teacher DDIM steps (rotations), no grads into the teacher
        v1 = teacher_v(x, sig_now)
        x_half = _rotate(x, v1, bc(phi_half - phi_now))
        v2 = teacher_v(x_half, sig_half)
        x_next = _rotate(x_half, v2, bc(phi_next - phi_half))
        x_next = jax.lax.stop_gradient(x_next)

        # exact one-step target: x_next = cos(D) x + sin(D) v*
        delta = bc(phi_next - phi_now)
        v_star = (x_next - jnp.cos(delta) * x) / jnp.sin(delta)

        s_ctx = model.encode_context(student_params["encoder"], onsets)
        v_pred = apply_fn(
            student_params["unet"], x, sig_now, context=s_ctx,
            embedding=embedding, rngs={"cfg": k_cfg},
        )
        return jnp.mean(jnp.square(v_pred - v_star))

    # -- full schedule --------------------------------------------------
    def distill(
        self,
        params: dict,
        batch_fn,
        key: jax.Array,
        log_fn=None,
    ) -> tuple[dict, int]:
        """Run the halving schedule; returns (distilled params, num_steps).

        ``batch_fn(step) -> {"wav", "onsets", "embedding"}`` supplies
        training batches (same contract as DiffusionTrainer batches).
        """
        cfg = self.cfg
        teacher = params
        n = cfg.start_steps

        from syncfusion_tpu.train.diffusion_trainer import ensure_key

        @jax.jit
        def train_step(student, opt_state, teacher, batch, key, n_steps):
            def f(p):
                return self.loss(
                    p, teacher, ensure_key(key), batch["wav"], batch["onsets"],
                    batch.get("embedding"), n_steps,
                )

            loss, grads = jax.value_and_grad(f)(student)
            updates, opt_state = self.tx.update(grads, opt_state, student)
            return optax.apply_updates(student, updates), opt_state, loss

        # One dispatch per round / per step: eager per-leaf tree copies and
        # eager key splits cost ~100 ms/op over the chip tunnel.
        copy_tree = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
        init_opt = jax.jit(self.tx.init)
        seed_rng = np.random.default_rng(
            np.asarray(jax.random.key_data(key)).ravel()
        )

        while n > cfg.final_steps:
            n_half = n // 2
            student = copy_tree(teacher)
            opt_state = init_opt(student)
            for step in range(cfg.steps_per_round):
                batch = batch_fn(step)
                student, opt_state, loss = train_step(
                    student, opt_state, teacher, batch,
                    np.uint32(seed_rng.integers(2**32)), np.int32(n_half),
                )
                if log_fn and (step % 100 == 0 or step == cfg.steps_per_round - 1):
                    log_fn({"round_steps": n_half, "step": step,
                            "distill_loss": float(loss)})
            teacher = student
            n = n_half
        return teacher, n
