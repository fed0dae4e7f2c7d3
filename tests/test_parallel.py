import jax
import numpy as np

from syncfusion_tpu.core.mesh import create_mesh, mesh_for_batch
from syncfusion_tpu.models.encoder1d import Encoder1d
from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion
from syncfusion_tpu.models.unet1d import UNet1d
from syncfusion_tpu.parallel.sampling import DataParallelSampler

L = 256
ENC = dict(in_channels=1, channels=2, multipliers=(1, 1, 4, 8), factors=(1, 4, 4),
           num_blocks=(1, 1, 1), resnet_groups=2)
UNET = dict(in_channels=1, channels=(4, 8, 16), factors=(1, 4, 4), items=(1, 1, 1),
            attentions=(0, 0, 1), cross_attentions=(1, 1, 1), context_channels=(2, 8, 16),
            attention_heads=2, attention_features=4, embedding_features=8,
            modulation_features=16, resnet_groups=2)


def test_mesh_for_batch():
    assert mesh_for_batch(16).shape["data"] == 8
    assert mesh_for_batch(6).shape["data"] == 6
    assert mesh_for_batch(1).shape["data"] == 1


def test_dp_sampler_runs_and_matches_single_device():
    model = SyncFusionDiffusion(unet=UNet1d(**UNET), onsets_encoder=Encoder1d(**ENC))
    params = model.init(jax.random.key(0), L, batch=1)

    mesh = create_mesh()
    sampler = DataParallelSampler(model, mesh, num_steps=2, embedding_scale=2.0,
                                  per_chip_batch=1, length=L)
    onsets = np.zeros((8, L, 1), np.float32)
    onsets[:, 9, 0] = 1.0
    emb = np.random.default_rng(0).normal(size=(8, 1, 8)).astype(np.float32)
    out = sampler(params, onsets, emb, jax.random.key(3))
    assert out.shape == (8, L)
    assert np.isfinite(out).all()

    # same noise through the unsharded path must agree
    import jax.numpy as jnp

    noise = jax.random.normal(jax.random.key(3), (8, L, 1))
    ref = model.sample(params, noise, jnp.asarray(onsets), jnp.asarray(emb),
                       num_steps=2, embedding_scale=2.0)
    np.testing.assert_allclose(out, np.asarray(ref)[:, :, 0], atol=2e-5)
