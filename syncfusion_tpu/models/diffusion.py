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


def band_segments(num_steps: int, lo: float, hi: float) -> list[tuple[int, int, bool]]:
    """Contiguous same-band-membership runs of the sampler's step range:
    ``[(start, end, in_band), ...)`` with ``end`` exclusive.

    THE canonical segmentation — the samplers (`v_sample`, `dpm_sample`)
    scan one `lax.scan` per segment (the CFG batch is 2B inside the band,
    B outside, so a segment boundary is a shape change) and bench.py's
    roofline weight accounting walks the identical segments.  Keeping one
    implementation keeps those in lockstep.
    """
    in_band = guidance_band_mask(num_steps, lo, hi)
    segs = []
    start = 0
    while start < num_steps:
        end = start
        while end < num_steps and in_band[end] == in_band[start]:
            end += 1
        segs.append((start, end, in_band[start]))
        start = end
    return segs


def _make_nets(
    apply_fn: Callable[..., jax.Array],
    params: Any,
    context: Optional[Sequence[jax.Array]],
    embedding: Optional[jax.Array],
    embedding_scale: float,
    deep_split: int = 0,
) -> tuple[Callable, Callable, bool]:
    """Shared per-step net evaluators for the samplers.

    Returns ``(net_cfg, net_plain, use_cfg)``; ``net_cfg`` folds the
    conditional and unconditional branches into ONE forward of batch 2B
    (uncond half passes the CFG mask → the net substitutes its fixed
    embedding) and combines with the reference plugin semantics
    ``v = v_uncond + (v_cond − v_uncond)·scale``.

    Each net has signature ``net(x, sigma_scalar, cache=None,
    want_deep=False) -> (v, deep)``: with ``deep_split`` set, ``cache``
    substitutes the deep half of the UNet (folded_apply's DeepCache mode)
    and ``want_deep=True`` returns the fresh deep feature; otherwise
    ``deep`` is None.
    """
    use_cfg = embedding is not None and embedding_scale != 1.0

    def _deep_kw(cache, want_deep):
        if not deep_split:
            assert cache is None and not want_deep, (
                "deep-cache kwargs require deep_split")
            return {}
        kw = {"deep_split": deep_split}
        if cache is not None:
            kw["deep_cache"] = cache
        if want_deep:
            kw["return_deep"] = True
        return kw

    def net_cfg(x, sigma_scalar, cache=None, want_deep=False):
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
        out = apply_fn(
            params, x2, sig2, context=ctx2, embedding=emb2,
            embedding_cfg_mask=mask, **_deep_kw(cache, want_deep),
        )
        v2, deep = out if want_deep else (out, None)
        v_cond, v_uncond = jnp.split(v2, 2, axis=0)
        return v_uncond + (v_cond - v_uncond) * embedding_scale, deep

    def net_plain(x, sigma_scalar, cache=None, want_deep=False):
        sig = jnp.full((x.shape[0],), sigma_scalar, jnp.float32)
        out = apply_fn(
            params, x, sig, context=context, embedding=embedding,
            **_deep_kw(cache, want_deep),
        )
        return out if want_deep else (out, None)

    return net_cfg, net_plain, use_cfg


def _normalize_deep_cache(deep_cache_interval: int, deep_split: int) -> int:
    """Shared enabling rule for the samplers: returns K (0 = disabled;
    intervals of 0/1 disable) and validates that a split level is set."""
    K = deep_cache_interval if deep_cache_interval and deep_cache_interval > 1 else 0
    if K and not deep_split:
        raise ValueError("deep_cache_interval requires deep_split")
    return K


def deep_cache_refresh_mask(seg_len: int, K: int, pow: float = 1.0) -> list[bool]:
    """Per-step deep-refresh mask for one sampler segment of ``seg_len``
    steps with DeepCache interval ``K``.

    ``pow=1`` is the uniform cadence (refresh at segment-local j % K == 0,
    bitwise-identical to the schedule the round-4 quality gates validated).
    ``pow != 1`` keeps the SAME refresh count (= ceil(seg_len/K), i.e. the
    same compute) but spaces the refreshes by a power curve: segment-local
    position ``j_k = floor(seg_len · (k/n)^(1/pow))``, so ``pow > 1``
    concentrates refreshes toward the segment END — LOW sigma, where the
    denoising trajectory curves hardest — and ``pow < 1`` toward the start
    (high sigma).  This is the DeepCache paper's non-uniform 1-in-K variant
    (Ma et al. 2023, arXiv:2312.00858 §4.2) with a single density knob.
    The segment start always refreshes (a guidance-band boundary changes
    the effective batch between B and 2B, so a stale cache there would be
    wrong-shaped — see `_cache_scan`).
    """
    n = -(-seg_len // K)  # ceil: refresh count matches the uniform cadence
    if pow == 1.0:
        return [j % K == 0 for j in range(seg_len)]
    raw = [int(seg_len * (k / n) ** (1.0 / pow)) for k in range(n)]
    # Two clamp passes that keep all n indices DISTINCT (a naive clamp to
    # seg_len-1 collides the tail for large pow, silently dropping
    # refreshes and breaking the same-compute invariant): backward, leave
    # room for the refreshes after k; forward, force strict increase.
    for k in range(n - 1, -1, -1):
        raw[k] = min(raw[k], seg_len - 1 - (n - 1 - k))
    mask = [False] * seg_len
    prev = -1
    for j in raw:
        j = max(j, prev + 1)
        mask[j] = True
        prev = j
    return mask


def _cache_scan(net, step_update, carry0, idx, refresh):
    """Run sampler steps ``idx`` (global indices) as ONE `lax.scan` with
    deep-cache: the net runs FULL on steps whose ``refresh`` flag is set
    (the first step always is, so a guidance-band boundary — where the
    effective batch changes between B and 2B — never reuses a stale or
    wrong-shaped cache) and on cached steps substitutes the previous deep
    feature.  ``refresh`` is a static per-step bool mask aligned with
    ``idx`` (see `deep_cache_refresh_mask`), scanned alongside it.

    ``net(x, i, cache, want_deep)`` takes the GLOBAL step index (the
    sampler wraps the sigma lookup); ``step_update(carry, i, v) -> carry``
    applies the sampler update given the net output; ``carry0`` is the
    sampler-specific carry (x for DDIM, (x, x0_prev) for DPM++) whose
    FIRST leaf is x.  The cache is initialized by shape only
    (jax.eval_shape — no compute); step 0's `full` branch overwrites it
    before any cached read.
    """
    assert refresh[0], "segment start must refresh the deep cache"
    x0 = jax.tree_util.tree_leaves(carry0)[0]
    cache_sd = jax.eval_shape(
        lambda x: net(x, jnp.int32(0), None, True)[1], x0)
    cache0 = jnp.zeros(cache_sd.shape, cache_sd.dtype)

    def step(carry_cache, ir):
        carry, cache = carry_cache
        i, r = ir
        x = jax.tree_util.tree_leaves(carry)[0]

        def full(args):
            x, _ = args
            return net(x, i, None, True)

        def cached(args):
            x, cache = args
            v, _ = net(x, i, cache, False)
            return v, cache

        v, cache = jax.lax.cond(r, full, cached, (x, cache))
        return (step_update(carry, i, v), cache), None

    refresh = jnp.asarray(refresh, jnp.bool_)
    (carry, _), _ = jax.lax.scan(step, (carry0, cache0), (idx, refresh))
    return carry


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
    deep_cache_interval: int = 0,
    deep_split: int = 0,
    deep_cache_pow: float = 1.0,
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

    ``deep_cache_interval=K`` (K>1) enables DeepCache deep-feature reuse:
    the UNet's deep half (levels >= ``deep_split``, bottleneck, deep up
    path) is recomputed only every K-th step and reused in between, so
    cached steps pay only the shallow levels (unet1d_folded.folded_apply
    docstring).  Requires an ``apply_fn`` supporting the deep kwargs (the
    folded path); the cache resets at guidance-band boundaries.
    ``deep_cache_pow != 1`` switches to the non-uniform refresh cadence of
    `deep_cache_refresh_mask` (same refresh count, power-curve spacing).
    """
    K = _normalize_deep_cache(deep_cache_interval, deep_split)
    net_cfg, net_plain, use_cfg = _make_nets(
        apply_fn, params, context, embedding, embedding_scale,
        deep_split=deep_split if K else 0)
    sigmas = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)

    def update(x, i, v):
        s_now, s_next = sigmas[i], sigmas[i + 1]
        a_now, b_now = alpha_beta(s_now)
        a_next, b_next = alpha_beta(s_next)
        x0 = a_now * x - b_now * v
        eps = b_now * x + a_now * v
        return a_next * x0 + b_next * eps

    def run_segment(net, x, start, end):
        idx = jnp.arange(start, end)
        if K:
            net_i = lambda x, i, cache, want: net(x, sigmas[i], cache, want)
            mask = deep_cache_refresh_mask(end - start, K, deep_cache_pow)
            return _cache_scan(net_i, update, x, idx, mask)

        def step(x, i):
            v, _ = net(x, sigmas[i])
            return update(x, i, v), None

        x, _ = jax.lax.scan(step, x, idx)
        return x

    if use_cfg and guidance_interval is not None:
        lo, hi = guidance_interval
        x = noise
        for start, end, banded in band_segments(num_steps, lo, hi):
            x = run_segment(net_cfg if banded else net_plain, x, start, end)
        return x

    return run_segment(net_cfg if use_cfg else net_plain, noise, 0, num_steps)


def _dpm_coefficients(num_steps: int):
    """Static per-step DPM-Solver++(2M) coefficients for the trig schedule.

    Precomputed host-side in float64 because the schedule's log-SNR
    ``λ = log(α/β)`` is −∞ at σ=1 and +∞ at σ=0: the boundary limits are
    exact constants (e^{-h}→0), so the first and last steps analytically
    reduce to first order — no ±inf ever reaches the compiled graph.

    Returns f32 arrays of shape (num_steps,): ``sig, a, b`` (state at the
    step's START) and the update constants ``c2`` (second-order
    extrapolation weight h_k/(2·h_{k-1}), zero where a neighbor h is
    infinite and on the lower-order-final last step), ``rb`` (β ratio
    β_{k+1}/β_k) and ``cD`` (= −α_{k+1}(e^{-h_k}−1)).
    """
    import numpy as np

    sig = np.linspace(1.0, 0.0, num_steps + 1)
    a = np.where(sig == 1.0, 0.0, np.cos(sig * np.pi / 2))  # cos(π/2)≈6e-17
    b = np.sin(sig * np.pi / 2)                              # sin(0) is exact
    with np.errstate(divide="ignore"):
        lam = np.log(a) - np.log(b)         # −inf .. +inf, increasing
    h = lam[1:] - lam[:-1]                   # h[0] = h[-1] = +inf
    rb = b[1:] / b[:-1]                      # rb[-1] = 0
    with np.errstate(over="ignore"):
        eh = np.exp(-h)                      # exp(−inf) = 0 at both ends
    cD = -a[1:] * (eh - 1.0)                 # cD[0] = α_1, cD[-1] = 1
    c2 = np.zeros(num_steps)
    for k in range(1, num_steps - 1):
        if np.isfinite(h[k - 1]) and np.isfinite(h[k]):
            c2[k] = h[k] / (2.0 * h[k - 1])
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    return f32(sig[:-1]), f32(a[:-1]), f32(b[:-1]), f32(c2), f32(rb), f32(cD)


def dpm_sample(
    apply_fn: Callable[..., jax.Array],
    params: Any,
    noise: jax.Array,
    num_steps: int,
    *,
    context: Optional[Sequence[jax.Array]] = None,
    embedding: Optional[jax.Array] = None,
    embedding_scale: float = 1.0,
    guidance_interval: Optional[tuple[float, float]] = None,
    deep_cache_interval: int = 0,
    deep_split: int = 0,
    deep_cache_pow: float = 1.0,
) -> jax.Array:
    """DPM-Solver++(2M) sampler on the same v-diffusion ODE as `v_sample`.

    Second-order multistep data-prediction solver (Lu et al. 2022,
    arXiv:2211.01095): each step reuses the previous step's x0 prediction
    to cancel the leading discretization error, so quality holds at ~2-4×
    fewer net evaluations than the reference's DDIM-style `v_sample` —
    same network, same CFG semantics, strictly a scheduler change (the
    reference has no counterpart; its sampler is fixed at VSampler,
    a-unet/audio-diffusion-pytorch 0.1.3).

    Update (x0-parameterization, h = λ_{k+1} − λ_k):
      D_k    = (1 + c2_k)·x0_k − c2_k·x0_{k-1}
      x_{k+1} = (β_{k+1}/β_k)·x − α_{k+1}(e^{−h}−1)·D_k
    with x0_k = α_k·x − β_k·v_θ(x, σ_k).  First/last steps are first-order
    (the trig schedule's boundary λ = ±∞ makes that exact — see
    `_dpm_coefficients`); with DPM++(1M) coefficients the update is
    algebraically identical to the DDIM step, so the order-2 term is the
    only difference.  Same `lax.scan` structure and guidance-interval
    segmentation as `v_sample`; the x0 history threads through segment
    boundaries in the carry.

    ``deep_cache_interval`` / ``deep_split``: DeepCache deep-feature
    reuse exactly as in `v_sample` (folded apply_fn only; cache resets
    at band boundaries).
    """
    K = _normalize_deep_cache(deep_cache_interval, deep_split)
    net_cfg, net_plain, use_cfg = _make_nets(
        apply_fn, params, context, embedding, embedding_scale,
        deep_split=deep_split if K else 0)
    sig, a, b, c2, rb, cD = _dpm_coefficients(num_steps)

    def update(carry, i, v):
        x, x0_prev = carry
        x0 = a[i] * x - b[i] * v
        d = (1.0 + c2[i]) * x0 - c2[i] * x0_prev
        return (rb[i] * x + cD[i] * d, x0)

    def run_segment(net, carry, start, end):
        idx = jnp.arange(start, end)
        if K:
            net_i = lambda x, i, cache, want: net(x, sig[i], cache, want)
            mask = deep_cache_refresh_mask(end - start, K, deep_cache_pow)
            return _cache_scan(net_i, update, carry, idx, mask)

        def step(carry, i):
            v, _ = net(carry[0], sig[i])
            return update(carry, i, v), None

        carry, _ = jax.lax.scan(step, carry, idx)
        return carry

    carry = (noise, jnp.zeros_like(noise))  # x0_prev unused while c2=0

    if use_cfg and guidance_interval is not None:
        lo, hi = guidance_interval
        for start, end, banded in band_segments(num_steps, lo, hi):
            carry = run_segment(net_cfg if banded else net_plain,
                                carry, start, end)
        return carry[0]

    carry = run_segment(net_cfg if use_cfg else net_plain, carry, 0, num_steps)
    return carry[0]
