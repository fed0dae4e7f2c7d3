import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syncfusion_tpu.models.vqgan.autoencoder import Decoder2d, Encoder2d
from syncfusion_tpu.models.vqgan.discriminator import NLayerDiscriminator
from syncfusion_tpu.models.vqgan.lpaps import LPAPS
from syncfusion_tpu.models.vqgan.model import SpecVQGAN, VQModel, wav_to_spec
from syncfusion_tpu.models.vqgan.quantize import VectorQuantizer
from syncfusion_tpu.train.vqgan_trainer import (
    VQGANLossConfig,
    VQGANTrainer,
    hinge_d_loss,
)

# tiny geometry for CPU: 20×40 spec, 2 downsamples → 5×10 tokens
TINY = dict(ch=8, ch_mult=(1, 2, 2), num_res_blocks=1, attn_resolutions=(10,),
            resolution=40, z_channels=16, embed_dim=16, n_embed=32)


def _tiny_model():
    return VQModel(
        embed_dim=TINY["embed_dim"], n_embed=TINY["n_embed"], ch=TINY["ch"],
        ch_mult=TINY["ch_mult"], num_res_blocks=TINY["num_res_blocks"],
        attn_resolutions=TINY["attn_resolutions"], resolution=TINY["resolution"],
        z_channels=TINY["z_channels"],
    )


def test_wav_to_spec_shape_and_range():
    wav = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 44100)).astype(np.float32) * 0.1
    )
    spec = wav_to_spec(wav)
    assert spec.shape == (2, 80, 160)
    assert float(spec.min()) >= -1.0 and float(spec.max()) <= 1.0


def test_quantizer_straight_through_and_loss():
    q = VectorQuantizer(n_e=16, e_dim=4)
    z = jax.random.normal(jax.random.key(0), (2, 3, 5, 4))
    params = q.init(jax.random.key(1), z)
    z_q, loss, info = q.apply(params, z)
    assert z_q.shape == z.shape
    assert info["indices"].shape == (2, 3, 5)
    assert float(loss) > 0
    # straight-through: d z_q/d z == identity
    g = jax.grad(lambda z: jnp.sum(q.apply(params, z)[0]))(z)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)
    # lookup round-trips the quantized values
    looked = q.lookup(params, info["indices"])
    got = np.asarray(z + jax.lax.stop_gradient(z_q - z) - z)  # z_q - z residue
    np.testing.assert_allclose(np.asarray(looked), np.asarray(z_q) - np.asarray(z) + np.asarray(z), atol=1e-6)


def test_quantizer_picks_nearest_code():
    q = VectorQuantizer(n_e=4, e_dim=2)
    z = jnp.zeros((1, 1, 1, 2))
    params = {"params": {"embedding": jnp.asarray(
        [[5.0, 5.0], [0.1, 0.1], [-3.0, 2.0], [9.0, -9.0]]
    )}}
    _, _, info = q.apply(params, z)
    assert int(info["indices"][0, 0, 0]) == 1


def test_encoder_decoder_geometry():
    enc = Encoder2d(**{k: TINY[k] for k in
                       ("ch", "ch_mult", "num_res_blocks", "attn_resolutions",
                        "resolution", "z_channels")})
    x = jnp.zeros((1, 20, 40, 1))
    p = jax.jit(lambda: enc.init(jax.random.key(0), x))()
    z = enc.apply(p, x)
    assert z.shape == (1, 5, 10, TINY["z_channels"])

    dec = Decoder2d(ch=TINY["ch"], ch_mult=TINY["ch_mult"],
                    num_res_blocks=TINY["num_res_blocks"],
                    attn_resolutions=TINY["attn_resolutions"],
                    resolution=TINY["resolution"], out_ch=1)
    pd = jax.jit(lambda: dec.init(jax.random.key(0), z))()
    rec = dec.apply(pd, z)
    assert rec.shape == (1, 20, 40, 1)


def test_full_reference_geometry_token_grid():
    """80×160 mel → 5×10 = 50 tokens (the transformer's clip=50 contract,
    reference av_cond_transformer.py)."""
    enc = Encoder2d()  # reference defaults
    x = jnp.zeros((1, 80, 160, 1))
    p = jax.jit(lambda: enc.init(jax.random.key(0), x))()
    z = jax.jit(lambda p, x: enc.apply(p, x))(p, x)
    assert z.shape == (1, 5, 10, 256)


def test_vqmodel_roundtrip_and_indices():
    sv = SpecVQGAN(_tiny_model())
    params = sv.init(jax.random.key(0))
    spec = jax.random.normal(jax.random.key(1), (2, 20, 40, 1)) * 0.1

    rec, qloss, info = sv.reconstruct(params, spec)
    assert rec.shape == spec.shape
    idx = sv.encode_indices(params, spec)
    assert idx.shape == (2, 5, 10)
    dec = sv.decode_indices(params, idx)
    assert dec.shape == spec.shape


def test_discriminator_patch_output():
    d = NLayerDiscriminator(ndf=8, n_layers=2)
    x = jnp.zeros((2, 20, 40, 1))
    v = jax.jit(lambda: d.init(jax.random.key(0), x, train=False))()
    out = d.apply(v, x, train=False)
    assert out.ndim == 4 and out.shape[0] == 2 and out.shape[-1] == 1


def test_hinge_d_loss():
    real = jnp.asarray([2.0, 2.0])
    fake = jnp.asarray([-2.0, -2.0])
    assert float(hinge_d_loss(real, fake)) == 0.0
    assert float(hinge_d_loss(-real, -fake)) == 3.0


def test_lpaps_zero_for_identical():
    lp = LPAPS()
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 1))
    v = jax.jit(lambda: lp.init(jax.random.key(1), x, x))()
    d = lp.apply(v, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    y = x + 0.5
    assert abs(float(lp.apply(v, x, y)[0])) > 0


def test_vqgan_train_step_runs_and_improves():
    trainer = VQGANTrainer(
        _tiny_model(),
        VQGANLossConfig(disc_start=2, perceptual_weight=0.0),
        learning_rate=1e-3,
        discriminator=NLayerDiscriminator(ndf=8, n_layers=2),
    )
    state = trainer.init(jax.random.key(0), spec_shape=(1, 20, 40, 1))
    spec = jax.random.normal(jax.random.key(1), (2, 20, 40, 1)) * 0.1
    losses = []
    for _ in range(4):
        state, metrics = trainer.train_step(state, spec)
        losses.append(float(metrics["loss/nll"]))
    assert int(state.step) == 4
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # disc was off for the first 2 steps
    assert float(metrics["loss/disc"]) >= 0.0


def test_actnorm_discriminator_data_dependent_init():
    from syncfusion_tpu.models.vqgan.discriminator import ActNorm

    an = ActNorm()
    x = jax.random.normal(jax.random.key(0), (4, 6, 6, 3)) * 5.0 + 2.0
    variables = an.init(jax.random.key(1), x, train=False)
    out, mutated = an.apply(variables, x, train=True, mutable=["batch_stats"])
    # first training batch → normalized output
    np.testing.assert_allclose(np.asarray(out).mean(axis=(0, 1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out).std(axis=(0, 1, 2)), 1.0, atol=1e-3)
    assert bool(mutated["batch_stats"]["initialized"])


def test_discriminator_actnorm_variant_runs():
    d = NLayerDiscriminator(ndf=8, n_layers=2, use_actnorm=True)
    x = jnp.zeros((2, 20, 40, 1))
    v = jax.jit(lambda: d.init(jax.random.key(0), x, train=False))()
    out = d.apply(v, x, train=False)
    assert out.shape[0] == 2
