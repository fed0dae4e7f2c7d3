import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syncfusion_tpu.models.diffusion import alpha_beta, v_diffusion_loss, v_sample
from syncfusion_tpu.models.encoder1d import Encoder1d
from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion
from syncfusion_tpu.models.unet1d import UNet1d

# Tiny configs: same structural rules as the full model
# (exp/model/diffusion.yaml), shrunk for CPU tests.
L = 512
ENC = dict(
    in_channels=1, channels=2,
    multipliers=(1, 1, 4, 8, 8), factors=(1, 4, 4, 2), num_blocks=(1, 1, 1, 1),
    resnet_groups=2,
)
UNET = dict(
    in_channels=1, channels=(4, 8, 16, 16), factors=(1, 4, 4, 2),
    items=(1, 1, 1, 2), attentions=(0, 0, 1, 1), cross_attentions=(1, 1, 1, 1),
    context_channels=(2, 8, 16, 16), attention_heads=2, attention_features=8,
    embedding_features=16, modulation_features=32, resnet_groups=2,
)


@pytest.fixture(scope="module")
def stack():
    model = SyncFusionDiffusion(unet=UNet1d(**UNET), onsets_encoder=Encoder1d(**ENC))
    params = model.init(jax.random.key(0), L, batch=2)
    return model, params


def test_encoder_xs_contract():
    """xs[2:-1] channel/length pyramid must match the UNet context spec."""
    enc = Encoder1d(**ENC)
    x = jnp.zeros((2, L, 1))
    params = enc.init(jax.random.key(0), x)
    _, info = enc.apply(params, x, with_info=True)
    xs = info["xs"]
    # [input, stem, block0..block3]
    assert len(xs) == 2 + len(ENC["factors"])
    ctx = xs[2:-1]
    chans = [c.shape[-1] for c in ctx]
    lens = [c.shape[1] for c in ctx]
    assert chans == [2, 8, 16]          # channels*multipliers[1:-1]
    assert lens == [L, L // 4, L // 16]  # cumprod of factors
    assert enc.context_channels()[: len(chans)] == chans


def test_full_reference_config_contract():
    """The real exp/model/diffusion.yaml geometry: encoder pyramid must line
    up with the UNet's context_channels at every level."""
    enc = Encoder1d()  # reference defaults
    unet = UNet1d()  # reference defaults
    ctx_ch = enc.context_channels()[:-1]
    assert ctx_ch == list(unet.context_channels[: len(ctx_ch)])
    facs = list(enc.factors)
    lens, cur = [], 1
    for f in facs[:-1]:
        cur *= f
        lens.append(cur)
    # encoder xs[2:-1] downsample factors == unet level cumulative factors
    cur, unet_lens = 1, []
    for f in unet.factors:
        cur *= f
        unet_lens.append(cur)
    assert lens == unet_lens[: len(lens)]


def test_loss_and_grads_finite(stack):
    model, params = stack
    wav = jax.random.normal(jax.random.key(1), (2, L, 1))
    onsets = jnp.zeros((2, L, 1)).at[:, 100, 0].set(1.0)
    emb = jax.random.normal(jax.random.key(2), (2, 1, 16))

    def loss_fn(p):
        return model.loss(p, jax.random.key(3), wav, onsets, emb, 0.1)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = jnp.sqrt(
        sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(grads))
    )
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_sample_shapes_and_finite(stack):
    model, params = stack
    noise = jax.random.normal(jax.random.key(4), (2, L, 1))
    onsets = jnp.zeros((2, L, 1)).at[:, 50, 0].set(1.0)
    emb = jax.random.normal(jax.random.key(5), (2, 1, 16))
    out = jax.jit(
        lambda p, n: model.sample(p, n, onsets, emb, num_steps=3, embedding_scale=2.0)
    )(params, noise)
    assert out.shape == (2, L, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_cfg_scale_one_equals_plain_conditional(stack):
    """scale=1.0 must bypass the CFG double-batch and equal the cond pass."""
    model, params = stack
    noise = jax.random.normal(jax.random.key(6), (1, L, 1))
    onsets = jnp.zeros((1, L, 1)).at[:, 10, 0].set(1.0)
    emb = jax.random.normal(jax.random.key(7), (1, 1, 16))
    a = model.sample(params, noise, onsets, emb, num_steps=2, embedding_scale=1.0)
    ctx = model.encode_context(params["encoder"], onsets)
    b = v_sample(model.unet.apply, params["unet"], noise, 2, context=ctx,
                 embedding=emb, embedding_scale=1.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_cfg_batched_equals_two_pass(stack):
    """The single 2B-batched CFG forward must equal two separate passes."""
    model, params = stack
    unet, uparams = model.unet, params["unet"]
    x = jax.random.normal(jax.random.key(8), (2, L, 1))
    sigma = jnp.full((2,), 0.4)
    onsets = jnp.zeros((2, L, 1)).at[:, 7, 0].set(1.0)
    ctx = model.encode_context(params["encoder"], onsets)
    emb = jax.random.normal(jax.random.key(9), (2, 1, 16))
    scale = 2.0

    v_cond = unet.apply(uparams, x, sigma, context=ctx, embedding=emb)
    v_uncond = unet.apply(uparams, x, sigma, context=ctx, embedding=None)
    expected = v_uncond + (v_cond - v_uncond) * scale

    # one step of the batched-CFG net used inside v_sample
    x2 = jnp.concatenate([x, x])
    ctx2 = [jnp.concatenate([c, c]) for c in ctx]
    emb2 = jnp.concatenate([emb, jnp.zeros_like(emb)])
    mask = jnp.concatenate([jnp.zeros((2, 1, 1)), jnp.ones((2, 1, 1))])
    v2 = unet.apply(uparams, x2, jnp.concatenate([sigma, sigma]), context=ctx2,
                    embedding=emb2, embedding_cfg_mask=mask)
    got_cond, got_uncond = jnp.split(v2, 2)
    got = got_uncond + (got_cond - got_uncond) * scale
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_vdiffusion_identities():
    sigma = jnp.array([0.0, 0.5, 1.0])
    a, b = alpha_beta(sigma)
    np.testing.assert_allclose(np.asarray(a**2 + b**2), 1.0, atol=1e-6)
    assert float(a[0]) == 1.0 and abs(float(b[2]) - 1.0) < 1e-6


def test_sampler_zero_steps_is_identity(stack):
    model, params = stack
    noise = jax.random.normal(jax.random.key(10), (1, L, 1))
    onsets = jnp.zeros((1, L, 1)).at[:, 0, 0].set(1.0)
    out = model.sample(params, noise, onsets, None, num_steps=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(noise))


def test_perfect_net_denoises():
    """If the net returns the true v, one step from sigma=1 → clean signal."""
    x_clean = jnp.ones((1, 8, 1)) * 0.3
    noise = jax.random.normal(jax.random.key(11), (1, 8, 1))

    def oracle(params, x, sigma, **kw):
        a, b = alpha_beta(sigma.reshape(-1, 1, 1))
        # derive eps from x = a·x_clean + b·eps  (valid for any sigma)
        eps = jnp.where(b > 0, (x - a * x_clean) / jnp.maximum(b, 1e-8), 0.0)
        return a * eps - b * x_clean

    out = v_sample(oracle, None, noise, num_steps=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x_clean), atol=1e-5)


def test_remat_unet_matches_plain():
    """remat=True must be numerically identical (it only trades memory)."""
    plain = UNet1d(**UNET)
    remat = UNet1d(**UNET, remat=True)
    x = jax.random.normal(jax.random.key(20), (1, L, 1))
    sigma = jnp.full((1,), 0.3)
    emb = jax.random.normal(jax.random.key(21), (1, 1, 16))
    params = plain.init({"params": jax.random.key(0), "cfg": jax.random.key(1)},
                        x, sigma, embedding=emb)
    out_a = plain.apply(params, x, sigma, embedding=emb)
    out_b = remat.apply(params, x, sigma, embedding=emb)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    ga = jax.grad(lambda p: jnp.sum(plain.apply(p, x, sigma, embedding=emb) ** 2))(params)
    gb = jax.grad(lambda p: jnp.sum(remat.apply(p, x, sigma, embedding=emb) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_resnet_block_matches_plain():
    """fused=True (Pallas chain) must match the plain path with the SAME
    params, within bf16-free f32 tolerance."""
    from syncfusion_tpu.models.blocks import ResnetBlock1d

    plain = ResnetBlock1d(channels=16, groups=2, fused=False)
    fused = ResnetBlock1d(channels=16, groups=2, fused=True, fused_block_l=64)
    x = jax.random.normal(jax.random.key(30), (2, 256, 12))
    temb = jax.random.normal(jax.random.key(31), (2, 32))
    params = plain.init(jax.random.key(0), x, temb)
    # identical param trees
    fparams = fused.init(jax.random.key(0), x, temb)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(fparams)

    out_plain = plain.apply(params, x, temb)
    out_fused = fused.apply(params, x, temb)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                               atol=3e-5)


def test_fused_unet_matches_plain():
    plain = UNet1d(**UNET)
    fused = UNet1d(**UNET, fused_resnet=True, fused_block_l=64)
    x = jax.random.normal(jax.random.key(32), (1, L, 1))
    sigma = jnp.full((1,), 0.6)
    emb = jax.random.normal(jax.random.key(33), (1, 1, 16))
    params = plain.init({"params": jax.random.key(0), "cfg": jax.random.key(1)},
                        x, sigma, embedding=emb)
    a = plain.apply(params, x, sigma, embedding=emb)
    b = fused.apply(params, x, sigma, embedding=emb)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_guidance_interval_full_band_equals_cfg(stack):
    """(0, 1) covers every sigma -> identical to plain CFG sampling."""
    model, params = stack
    noise = jax.random.normal(jax.random.key(8), (1, L, 1))
    onsets = jnp.zeros((1, L, 1)).at[:, 20, 0].set(1.0)
    emb = jax.random.normal(jax.random.key(9), (1, 1, 16))
    a = model.sample(params, noise, onsets, emb, num_steps=4,
                     embedding_scale=2.0)
    b = model.sample(params, noise, onsets, emb, num_steps=4,
                     embedding_scale=2.0, guidance_interval=(0.0, 1.0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_guidance_interval_empty_band_equals_conditional(stack):
    """A band no sigma falls in -> every step is the cond-only forward."""
    model, params = stack
    noise = jax.random.normal(jax.random.key(10), (1, L, 1))
    onsets = jnp.zeros((1, L, 1)).at[:, 30, 0].set(1.0)
    emb = jax.random.normal(jax.random.key(11), (1, 1, 16))
    a = model.sample(params, noise, onsets, emb, num_steps=4,
                     embedding_scale=1.0)
    b = model.sample(params, noise, onsets, emb, num_steps=4,
                     embedding_scale=2.0, guidance_interval=(2.0, 3.0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_guidance_interval_partial_band_jits_and_differs(stack):
    """A middle band compiles (static scan segments) and actually guides:
    differs from both always-CFG and never-CFG trajectories."""
    model, params = stack
    noise = jax.random.normal(jax.random.key(12), (1, L, 1))
    onsets = jnp.zeros((1, L, 1)).at[:, 40, 0].set(1.0)
    emb = jax.random.normal(jax.random.key(13), (1, 1, 16))
    gi = jax.jit(
        lambda p, n: model.sample(p, n, onsets, emb, num_steps=6,
                                  embedding_scale=3.0,
                                  guidance_interval=(0.2, 0.8))
    )(params, noise)
    full = model.sample(params, noise, onsets, emb, num_steps=6,
                        embedding_scale=3.0)
    none = model.sample(params, noise, onsets, emb, num_steps=6,
                        embedding_scale=1.0)
    assert gi.shape == (1, L, 1) and np.isfinite(np.asarray(gi)).all()
    assert not np.allclose(np.asarray(gi), np.asarray(full), atol=1e-4)
    assert not np.allclose(np.asarray(gi), np.asarray(none), atol=1e-4)


def test_guidance_band_mask_includes_exact_boundary_steps():
    """Band edges landing exactly on a step's sigma include that step.

    Regression: `1 - 120/150` rounds to 0.19999999999999996 < 0.2, so a
    naive float comparison drops the sigma=lo step from the (0.2, 0.8)
    band at the production step counts (100/150)."""
    from syncfusion_tpu.models.diffusion import guidance_band_mask

    for n in (100, 150):
        mask = guidance_band_mask(n, 0.2, 0.8)
        ks = [k for k, m in enumerate(mask) if m]
        # sigma = 1 - k/n in [0.2, 0.8]  <=>  k in [0.2n, 0.8n] inclusive.
        assert ks[0] == int(round(0.2 * n))
        assert ks[-1] == int(round(0.8 * n))


def test_band_segments_canonical():
    """band_segments is THE shared segmentation (samplers + bench roofline):
    pin the serving default's segments and the mask roundtrip."""
    from syncfusion_tpu.models.diffusion import band_segments, guidance_band_mask

    segs = band_segments(150, 0.2, 0.8)
    # sigma_k = 1 - k/150 in [0.2, 0.8] <=> k in [30, 120] (edges inclusive)
    assert segs == [(0, 30, False), (30, 121, True), (121, 150, False)]
    for n, lo, hi in [(150, 0.2, 0.8), (32, 0.2, 0.8), (8, 0.0, 1.0),
                      (1, 0.3, 0.4), (5, 0.9, 1.0)]:
        segs = band_segments(n, lo, hi)
        mask = guidance_band_mask(n, lo, hi)
        # segments tile [0, n) exactly and alternate membership
        assert segs[0][0] == 0 and segs[-1][1] == n
        for (s0, e0, b0), (s1, e1, b1) in zip(segs, segs[1:]):
            assert e0 == s1 and b0 != b1
        for s, e, b in segs:
            assert all(mask[j] == b for j in range(s, e))


def test_deep_cache_refresh_mask_schedules():
    """Uniform pow=1 is bitwise j % K == 0 (the round-4-validated cadence);
    pow != 1 keeps the refresh COUNT (same compute) but re-spaces: pow > 1
    concentrates refreshes toward the segment end (low sigma)."""
    from syncfusion_tpu.models.diffusion import deep_cache_refresh_mask

    for seg_len, K in [(150, 3), (91, 3), (30, 2), (7, 4), (1, 3), (5, 2)]:
        uni = deep_cache_refresh_mask(seg_len, K)
        assert uni == [j % K == 0 for j in range(seg_len)]
        # large pows exercise the end-clamp: a naive clamp collides tail
        # indices and silently drops refreshes (review finding, round 5)
        for pow in (0.25, 0.5, 2.0, 4.0, 8.0):
            nu = deep_cache_refresh_mask(seg_len, K, pow)
            assert len(nu) == seg_len and nu[0]
            assert sum(nu) == sum(uni), (seg_len, K, pow)

    # pow=2 on a long segment: gaps shrink toward the end (denser refresh
    # at low sigma), and the converse for pow=0.5.
    nu = deep_cache_refresh_mask(150, 3, 2.0)
    idx = [j for j, m in enumerate(nu) if m]
    gaps = [b - a for a, b in zip(idx, idx[1:])]
    assert gaps[0] > gaps[-1] and gaps[0] > 3 and gaps[-1] <= 2
    nu_lo = deep_cache_refresh_mask(150, 3, 0.5)
    idx_lo = [j for j, m in enumerate(nu_lo) if m]
    gaps_lo = [b - a for a, b in zip(idx_lo, idx_lo[1:])]
    assert gaps_lo[0] < gaps_lo[-1]


# ---------------------------------------------------------------------------
# DPM-Solver++(2M) sampler (models/diffusion.dpm_sample)
# ---------------------------------------------------------------------------

def _gaussian_oracle_net(s):
    """Exact v-net for Gaussian data x0 ~ N(0, s² I).

    The probability-flow ODE for a Gaussian is linear, mapping initial
    noise z exactly to s·z — giving a closed-form target to measure true
    sampler discretization error against."""
    def apply_fn(params, x, sigma, context=None, embedding=None, **kw):
        a, b = alpha_beta(sigma.reshape((-1,) + (1,) * (x.ndim - 1)))
        x0_hat = (a * s * s) / (a * a * s * s + b * b) * x
        eps_hat = (x - a * x0_hat) / jnp.maximum(b, 1e-20)
        return a * eps_hat - b * x0_hat
    return apply_fn


def test_dpm_is_higher_order_than_ddim():
    """On the closed-form Gaussian ODE, DPM++(2M) error must shrink ~4× per
    step-count doubling (2nd order) vs ~2× for the DDIM v_sampler, and be
    several-fold smaller at equal steps."""
    from syncfusion_tpu.models.diffusion import dpm_sample

    apply_fn = _gaussian_oracle_net(0.35)
    noise = jax.random.normal(jax.random.key(0), (2, 64, 1), jnp.float32)
    exact = 0.35 * noise

    def err(fn, n):
        return float(jnp.abs(fn(apply_fn, {}, noise, n) - exact).max())

    e_ddim16, e_ddim32 = err(v_sample, 16), err(v_sample, 32)
    e_dpm16, e_dpm32 = err(dpm_sample, 16), err(dpm_sample, 32)
    assert e_dpm16 < e_ddim16 / 3          # measured ~5.4× better
    assert e_dpm32 < e_ddim32 / 5          # measured ~9.8× better
    assert e_dpm16 / e_dpm32 > 3.0          # ~2nd-order convergence
    assert e_ddim16 / e_ddim32 < 3.0        # 1st-order for contrast


def test_dpm_coefficients_boundaries():
    """First/last steps must be exactly first-order with finite constants
    (the trig schedule's λ = ±∞ boundary limits)."""
    from syncfusion_tpu.models.diffusion import _dpm_coefficients

    n = 10
    sig, a, b, c2, rb, cD = (np.asarray(v) for v in _dpm_coefficients(n))
    assert np.isfinite(c2).all() and np.isfinite(rb).all() and np.isfinite(cD).all()
    assert c2[0] == 0.0 and c2[1] == 0.0 and c2[-1] == 0.0
    # first step: x1 = β1·x + α1·x0  (DDIM from pure noise)
    a1, b1 = np.cos((1 - 1 / n) * np.pi / 2), np.sin((1 - 1 / n) * np.pi / 2)
    np.testing.assert_allclose(rb[0], b1, rtol=1e-6)
    np.testing.assert_allclose(cD[0], a1, rtol=1e-6)
    # last step collapses to the extrapolated x0: x = 1·D
    np.testing.assert_allclose(rb[-1], 0.0, atol=1e-12)
    np.testing.assert_allclose(cD[-1], 1.0, rtol=1e-6)


def test_dpm_through_model_cfg_and_band(stack):
    """dpm sampler through SyncFusionDiffusion.sample: jits, correct shape,
    finite, and the guidance-interval segmentation produces a different
    (but finite) result than full-band CFG."""
    model, params = stack
    noise = jax.random.normal(jax.random.key(11), (2, L, 1))
    onsets = jnp.zeros((2, L, 1)).at[:, 50, 0].set(1.0)
    emb = jax.random.normal(jax.random.key(12), (2, 1, 16))
    full = jax.jit(lambda p, n: model.sample(
        p, n, onsets, emb, num_steps=5, embedding_scale=2.0, sampler="dpm"
    ))(params, noise)
    band = jax.jit(lambda p, n: model.sample(
        p, n, onsets, emb, num_steps=5, embedding_scale=2.0, sampler="dpm",
        guidance_interval=(0.3, 0.7),
    ))(params, noise)
    assert full.shape == band.shape == (2, L, 1)
    assert np.isfinite(np.asarray(full)).all()
    assert np.isfinite(np.asarray(band)).all()
    assert float(jnp.abs(full - band).max()) > 1e-7


def test_dpm_folded_matches_unfolded():
    """fold_cap execution must not change dpm sampling (same contract as
    the ddim folded-equivalence tests in test_unet_folded.py)."""
    base = SyncFusionDiffusion(unet=UNet1d(**UNET), onsets_encoder=Encoder1d(**ENC))
    params = base.init(jax.random.key(0), L, batch=1)
    folded = SyncFusionDiffusion(
        unet=UNet1d(**UNET), onsets_encoder=Encoder1d(**ENC), fold_cap=64)
    noise = jax.random.normal(jax.random.key(13), (1, L, 1))
    onsets = jnp.zeros((1, L, 1)).at[:, 50, 0].set(1.0)
    emb = jax.random.normal(jax.random.key(14), (1, 1, 16))
    a = base.sample(params, noise, onsets, emb, num_steps=4,
                    embedding_scale=2.0, sampler="dpm")
    b = folded.sample(params, noise, onsets, emb, num_steps=4,
                      embedding_scale=2.0, sampler="dpm")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
