"""Weight-compat diffusion stack: torch recon ↔ JAX parity + ckpt ingestion.

The torch side (models/adp_torch_recon.py) is the documented reconstruction
of audio-diffusion-pytorch 0.1.3 UNetV0 / audio-encoders-pytorch 0.0.22
Encoder1d; these tests prove the JAX compat models + converter reproduce it
exactly, so a real reference checkpoint that matches the recon's manifest
loads and evaluates identically.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from syncfusion_tpu.models.adp_compat import Encoder1dCompat, UNetV0Compat
from syncfusion_tpu.models.adp_convert import (
    convert_diffusion_ckpt,
    convert_encoder_state,
    convert_unet_state,
)
from syncfusion_tpu.models.adp_torch_recon import (
    Encoder1dConfig,
    UNetV0Config,
    build_encoder_recon,
    build_unet_recon,
    encoder_manifest,
    unet_manifest,
)

torch = pytest.importorskip("torch")

SMALL = UNetV0Config(
    in_channels=1,
    channels=(4, 8, 8),
    factors=(1, 2, 2),
    items=(1, 2, 1),
    attentions=(0, 0, 1),
    cross_attentions=(1, 0, 1),
    context_channels=(2, 4, 4),  # level 2 injector exists; tests starve it
    attention_heads=2,
    attention_features=4,
    embedding_features=16,
    embedding_max_length=1,
    modulation_features=8,
    resnet_groups=2,
    fourier_dim=8,
)

ENC_SMALL = Encoder1dConfig(
    in_channels=1, channels=2, multipliers=(1, 1, 2, 4), factors=(1, 2, 2),
    num_blocks=(1, 1, 1), resnet_groups=1,
)


def _manifest_matches_recon(recon, manifest):
    got = [(k, tuple(v.shape)) for k, v in recon.state_dict().items()]
    assert got == [(k, tuple(s)) for k, s in manifest]


def test_unet_manifest_matches_recon_small():
    _manifest_matches_recon(build_unet_recon(SMALL), unet_manifest(SMALL))


def test_unet_manifest_matches_recon_reference_size():
    # full exp/model/diffusion.yaml config on the meta device (shape-only)
    cfg = UNetV0Config()
    with torch.device("meta"):
        recon = build_unet_recon(cfg)
    _manifest_matches_recon(recon, unet_manifest(cfg))
    n_params = sum(int(np.prod(s)) for _, s in unet_manifest(cfg))
    assert 5e7 < n_params < 5e8  # same size class as the reference UNet


def test_encoder_manifest_matches_recon():
    _manifest_matches_recon(build_encoder_recon(ENC_SMALL),
                            encoder_manifest(ENC_SMALL))
    with torch.device("meta"):
        recon = build_encoder_recon(Encoder1dConfig())
    _manifest_matches_recon(recon, encoder_manifest(Encoder1dConfig()))


def _torch_inputs(cfg, B=2, L=16, ctx_levels=None, seed=0):
    g = torch.Generator().manual_seed(seed)
    x = torch.randn(B, cfg.in_channels, L, generator=g)
    t = torch.rand(B, generator=g)
    emb = torch.randn(B, cfg.embedding_max_length, cfg.embedding_features,
                      generator=g)
    ctx = []
    length = L
    for lvl, (f, cc) in enumerate(zip(cfg.factors, cfg.context_channels)):
        length //= f
        if ctx_levels is not None and lvl >= ctx_levels:
            break
        if cc > 0:
            ctx.append(torch.randn(B, cc, length, generator=g))
        else:
            ctx.append(None)
    return x, t, emb, ctx


def _to_jax_ctx(ctx):
    return [None if c is None else jnp.asarray(c.numpy().transpose(0, 2, 1))
            for c in ctx]


@pytest.mark.parametrize("ctx_levels", [None, 2])  # 2 → last level starved
def test_unet_forward_parity(ctx_levels):
    recon = build_unet_recon(SMALL).eval()
    x, t, emb, ctx = _torch_inputs(SMALL, ctx_levels=ctx_levels)
    with torch.no_grad():
        ref = recon(x, t, embedding=emb, channels=ctx).numpy()

    model = UNetV0Compat(cfg=SMALL)
    params = convert_unet_state(recon.state_dict(), SMALL)
    out = model.apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 1)), jnp.asarray(t.numpy()),
        context=_to_jax_ctx(ctx), embedding=jnp.asarray(emb.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), ref, rtol=2e-4, atol=2e-5
    )


def test_unet_multi_token_cross_attention_parity():
    cfg = UNetV0Config(
        in_channels=1, channels=(4, 8), factors=(1, 2), items=(1, 1),
        attentions=(0, 1), cross_attentions=(1, 1), context_channels=(0, 0),
        attention_heads=2, attention_features=4, embedding_features=16,
        embedding_max_length=3, modulation_features=8, resnet_groups=2,
        fourier_dim=8,
    )
    recon = build_unet_recon(cfg).eval()
    x, t, emb, _ = _torch_inputs(cfg, L=8)
    with torch.no_grad():
        ref = recon(x, t, embedding=emb, channels=None).numpy()
    out = UNetV0Compat(cfg=cfg).apply(
        convert_unet_state(recon.state_dict(), cfg),
        jnp.asarray(x.numpy().transpose(0, 2, 1)), jnp.asarray(t.numpy()),
        embedding=jnp.asarray(emb.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), ref, rtol=2e-4, atol=2e-5
    )


def test_unet_cfg_fixed_embedding_parity():
    """flax embedding=None must equal torch with the fixed embedding row."""
    recon = build_unet_recon(SMALL).eval()
    x, t, _, ctx = _torch_inputs(SMALL)
    fixed = recon.fixed_embedding.weight[None].expand(x.shape[0], -1, -1)
    with torch.no_grad():
        ref = recon(x, t, embedding=fixed, channels=ctx).numpy()
    out = UNetV0Compat(cfg=SMALL).apply(
        convert_unet_state(recon.state_dict(), SMALL),
        jnp.asarray(x.numpy().transpose(0, 2, 1)), jnp.asarray(t.numpy()),
        context=_to_jax_ctx(ctx), embedding=None,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), ref, rtol=2e-4, atol=2e-5
    )


def test_encoder_forward_parity_and_xs_contract():
    recon = build_encoder_recon(ENC_SMALL).eval()
    g = torch.Generator().manual_seed(1)
    x = torch.randn(2, 1, 16, generator=g)
    with torch.no_grad():
        ref_out, ref_info = recon(x, with_info=True)

    model = Encoder1dCompat(cfg=ENC_SMALL)
    params = convert_encoder_state(recon.state_dict(), ENC_SMALL)
    out, info = model.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                            with_info=True)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), ref_out.numpy(), rtol=2e-4, atol=2e-5
    )
    assert len(info["xs"]) == len(ref_info["xs"])
    for mine, theirs in zip(info["xs"], ref_info["xs"]):
        np.testing.assert_allclose(
            np.asarray(mine).transpose(0, 2, 1), theirs.numpy(),
            rtol=2e-4, atol=2e-5,
        )


def test_converted_tree_matches_init_tree():
    recon = build_unet_recon(SMALL)
    converted = convert_unet_state(recon.state_dict(), SMALL)
    model = UNetV0Compat(cfg=SMALL)
    x, t, emb, ctx = _torch_inputs(SMALL)
    init = model.init(
        {"params": jax.random.key(0), "cfg": jax.random.key(1)},
        jnp.asarray(x.numpy().transpose(0, 2, 1)), jnp.asarray(t.numpy()),
        context=_to_jax_ctx(ctx), embedding=jnp.asarray(emb.numpy()),
    )
    flat_c = jax.tree_util.tree_leaves_with_path(converted)
    flat_i = jax.tree_util.tree_leaves_with_path(init)
    paths_c = {jax.tree_util.keystr(p): v.shape for p, v in flat_c}
    paths_i = {jax.tree_util.keystr(p): v.shape for p, v in flat_i}
    assert paths_c == paths_i


def test_positional_alignment_roundtrip():
    """Anonymous (a-unet style) keys ingest via order+shape matching."""
    recon = build_unet_recon(SMALL).eval()
    sd = recon.state_dict()
    anon = {f"blocks.{i}.anon": v for i, v in enumerate(sd.values())}
    x, t, emb, ctx = _torch_inputs(SMALL)
    with torch.no_grad():
        ref = recon(x, t, embedding=emb, channels=ctx).numpy()
    out = UNetV0Compat(cfg=SMALL).apply(
        convert_unet_state(anon, SMALL),
        jnp.asarray(x.numpy().transpose(0, 2, 1)), jnp.asarray(t.numpy()),
        context=_to_jax_ctx(ctx), embedding=jnp.asarray(emb.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), ref, rtol=2e-4, atol=2e-5
    )


def test_lightning_ckpt_ingestion(tmp_path):
    """Synthesized module_diffusion.Model-shaped .ckpt loads end to end."""
    unet = build_unet_recon(SMALL)
    enc = build_encoder_recon(ENC_SMALL)
    sd = {}
    for k, v in unet.state_dict().items():
        sd[f"model.net.{k}"] = v
        sd[f"model.diffusion.net.{k}"] = v  # shared-module duplicates
        sd[f"model.sampler.net.{k}"] = v
    for k, v in enc.state_dict().items():
        sd[f"onsets_encoder.{k}"] = v
    sd["embedder.model.dummy"] = torch.zeros(1)  # frozen CLAP, ignored
    path = tmp_path / "epoch=784-valid_loss=0.008.ckpt"
    torch.save({"state_dict": sd, "epoch": 784}, path)

    from syncfusion_tpu.models.adp_convert import load_diffusion_ckpt

    params = load_diffusion_ckpt(path, SMALL, ENC_SMALL)
    assert set(params) == {"unet", "encoder"}

    # runs through the SyncFusionDiffusion facade
    from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion

    sf = SyncFusionDiffusion(
        unet=UNetV0Compat(cfg=SMALL), onsets_encoder=Encoder1dCompat(cfg=ENC_SMALL)
    )
    wav = sf.sample(
        params,
        noise=jnp.zeros((1, 16, 1)),
        onsets=jnp.zeros((1, 16, 1)),
        embedding=jnp.zeros((1, 1, SMALL.embedding_features)),
        num_steps=2,
        embedding_scale=2.0,
    )
    assert wav.shape == (1, 16, 1) and np.isfinite(np.asarray(wav)).all()


@pytest.mark.parametrize("cat_order,skip_scale", [
    ("skip_first", 2.0 ** -0.5), ("x_first", 1.0),
])
def test_unet_d4_variant_knobs_parity(cat_order, skip_scale):
    """D4 runtime switches (cat order / skip scale) stay torch⇄jax exact in
    BOTH positions, and flipping them genuinely changes the function — the
    property the adp_variant_sweep checkpoint gate relies on."""
    import dataclasses

    cfg = dataclasses.replace(SMALL, cat_order=cat_order, skip_scale=skip_scale)
    recon = build_unet_recon(cfg).eval()
    x, t, emb, ctx = _torch_inputs(cfg)
    with torch.no_grad():
        ref = recon(x, t, embedding=emb, channels=ctx).numpy()

    model = UNetV0Compat(cfg=cfg)
    params = convert_unet_state(recon.state_dict(), cfg)
    out = model.apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 1)), jnp.asarray(t.numpy()),
        context=_to_jax_ctx(ctx), embedding=jnp.asarray(emb.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), ref, rtol=2e-4, atol=2e-5
    )

    # discriminability: the other cat order gives a different output from
    # the SAME params
    other = dataclasses.replace(
        cfg, cat_order="x_first" if cat_order == "skip_first" else "skip_first"
    )
    out_other = UNetV0Compat(cfg=other).apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 1)), jnp.asarray(t.numpy()),
        context=_to_jax_ctx(ctx), embedding=jnp.asarray(emb.numpy()),
    )
    assert np.abs(np.asarray(out) - np.asarray(out_other)).max() > 1e-4
