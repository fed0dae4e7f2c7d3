"""v-objective diffusion: training loss and deterministic sampler.

Semantics follow the reference's VDiffusion/VSampler
(audio-diffusion-pytorch 0.1.3, selected at exp/model/diffusion.yaml:24-29):

  * time ``sigma ~ U(0,1)``; angle = sigma·π/2, alpha = cos, beta = sin
  * ``x_noisy = alpha·x + beta·eps``; target ``v = alpha·eps − beta·x``;
    loss = MSE(v_pred, v_target)
  * sampler: sigmas = linspace(1→0, num_steps+1); per step
    ``x0 = a_i·x − b_i·v``, ``eps = b_i·x + a_i·v``,
    ``x ← a_{i+1}·x0 + b_{i+1}·eps``
  * CFG combine: ``v = v_uncond + (v_cond − v_uncond)·scale``
    (reference plugin semantics — uncond uses the net's learned fixed
    embedding).

TPU-first details: the sampling loop is a single ``lax.scan`` (one compiled
step re-used 150×), and the CFG pair runs as ONE batched forward of 2·B
rather than two sequential net calls.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def alpha_beta(sigma: jax.Array) -> tuple[jax.Array, jax.Array]:
    angle = sigma * (math.pi / 2)
    return jnp.cos(angle), jnp.sin(angle)


def _bcast(t: jax.Array, ndim: int) -> jax.Array:
    return t.reshape(t.shape + (1,) * (ndim - t.ndim))


def v_diffusion_loss(
    apply_fn: Callable[..., jax.Array],
    params: Any,
    key: jax.Array,
    x: jax.Array,
    *,
    context: Optional[Sequence[jax.Array]] = None,
    embedding: Optional[jax.Array] = None,
    embedding_mask_proba: float = 0.0,
) -> jax.Array:
    """Training loss on waveforms ``x (B, L, C)``."""
    k_sigma, k_noise, k_cfg = jax.random.split(key, 3)
    sigma = jax.random.uniform(k_sigma, (x.shape[0],), dtype=jnp.float32)
    noise = jax.random.normal(k_noise, x.shape, dtype=x.dtype)
    alpha, beta = alpha_beta(_bcast(sigma, x.ndim))
    x_noisy = alpha * x + beta * noise
    v_target = alpha * noise - beta * x
    v_pred = apply_fn(
        params,
        x_noisy,
        sigma,
        context=context,
        embedding=embedding,
        embedding_mask_proba=embedding_mask_proba,
        rngs={"cfg": k_cfg},
    )
    return jnp.mean(jnp.square(v_pred - v_target))


def guidance_band_mask(num_steps: int, lo: float, hi: float) -> list[bool]:
    """Static CFG-band membership per sampler step (k has sigma = 1 - k/n).

    A band edge landing exactly on a step's sigma includes that step, but
    both ``1 - k/n`` and ``lo*n`` carry float rounding (e.g.
    ``1 - 120/150 < 0.2``), so compare with a tolerance far below 1/n.
    """
    eps = 1e-9
    return [
        lo - eps <= 1.0 - k / num_steps <= hi + eps for k in range(num_steps)
    ]


def v_sample(
    apply_fn: Callable[..., jax.Array],
    params: Any,
    noise: jax.Array,
    num_steps: int,
    *,
    context: Optional[Sequence[jax.Array]] = None,
    embedding: Optional[jax.Array] = None,
    embedding_scale: float = 1.0,
    guidance_interval: Optional[tuple[float, float]] = None,
) -> jax.Array:
    """Deterministic v-sampler from pure noise ``(B, L, C)``.

    With ``embedding_scale != 1`` the conditional and unconditional branches
    are folded into a single forward of batch 2B (uncond branch passes
    ``embedding=None`` → the net substitutes its fixed embedding).

    ``guidance_interval=(lo, hi)`` applies CFG only at noise levels
    ``lo <= sigma <= hi`` (sigma runs 1→0 over the trajectory); steps
    outside the band run a single conditional forward at half the compute
    (Kynkäänniemi et al. 2024, "Applying guidance in a limited interval",
    arXiv:2404.07724 — guidance at the extreme noise levels is known to
    cost compute without helping, and can actively hurt at high sigma).
    The step schedule is static, so the trajectory splits into contiguous
    `lax.scan` segments — no per-step branching in the compiled graph.
    """
    use_cfg = embedding is not None and embedding_scale != 1.0
    sigmas = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)

    def net_cfg(x, sigma_scalar):
        x2 = jnp.concatenate([x, x], axis=0)
        ctx2 = (
            [jnp.concatenate([c, c], axis=0) for c in context]
            if context is not None
            else None
        )
        emb2 = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding)], axis=0
        )
        # mask=1 on the second half → net uses its fixed embedding there.
        mask = jnp.concatenate(
            [jnp.zeros((x.shape[0], 1, 1)), jnp.ones((x.shape[0], 1, 1))], axis=0
        )
        sig2 = jnp.full((x2.shape[0],), sigma_scalar, jnp.float32)
        v2 = apply_fn(
            params, x2, sig2, context=ctx2, embedding=emb2,
            embedding_cfg_mask=mask,
        )
        v_cond, v_uncond = jnp.split(v2, 2, axis=0)
        return v_uncond + (v_cond - v_uncond) * embedding_scale

    def net_plain(x, sigma_scalar):
        sig = jnp.full((x.shape[0],), sigma_scalar, jnp.float32)
        return apply_fn(params, x, sig, context=context, embedding=embedding)

    def make_step(net):
        def step(x, i):
            s_now, s_next = sigmas[i], sigmas[i + 1]
            a_now, b_now = alpha_beta(s_now)
            a_next, b_next = alpha_beta(s_next)
            v = net(x, s_now)
            x0 = a_now * x - b_now * v
            eps = b_now * x + a_now * v
            return a_next * x0 + b_next * eps, None
        return step

    if use_cfg and guidance_interval is not None:
        lo, hi = guidance_interval
        step_cfg, step_plain = make_step(net_cfg), make_step(net_plain)
        in_band = guidance_band_mask(num_steps, lo, hi)
        x = noise
        start = 0
        while start < num_steps:
            end = start
            while end < num_steps and in_band[end] == in_band[start]:
                end += 1
            step = step_cfg if in_band[start] else step_plain
            x, _ = jax.lax.scan(step, x, jnp.arange(start, end))
            start = end
        return x

    step = make_step(net_cfg if use_cfg else net_plain)
    x, _ = jax.lax.scan(step, noise, jnp.arange(num_steps))
    return x
