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


def test_local_rows_handles_unsharded_batch_dim():
    """data-axis size 1 (model-parallel-only mesh): the batch dim's shard
    index is slice(None) — local_rows must return ALL rows, not an empty
    arange(None or 0, None) (review finding, round 5)."""
    from syncfusion_tpu.core.mesh import MeshSpec, local_rows, shard_global_array

    mesh = create_mesh(MeshSpec(data=1, model=8))
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = shard_global_array(x, mesh)
    rows, idx = local_rows(arr)
    np.testing.assert_array_equal(idx, np.arange(8))
    np.testing.assert_array_equal(rows, x)


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
    # the serving wrapper defaults to the guidance-interval band — the
    # unsharded reference call must use the same sampler settings
    ref = model.sample(params, noise, jnp.asarray(onsets), jnp.asarray(emb),
                       num_steps=2, embedding_scale=2.0,
                       guidance_interval=(0.2, 0.8))
    np.testing.assert_allclose(out, np.asarray(ref)[:, :, 0], atol=2e-5)

    # dpm sampler serves over the mesh too
    dpm = DataParallelSampler(model, mesh, num_steps=2, embedding_scale=2.0,
                              per_chip_batch=1, length=L, sampler="dpm")
    out_dpm = dpm(params, onsets, emb, jax.random.key(3))
    assert out_dpm.shape == (8, L) and np.isfinite(out_dpm).all()
    assert float(np.abs(out_dpm - out).max()) > 1e-7  # genuinely different path

    # DeepCache serving option over the mesh (folded execution path)
    import dataclasses as dc

    folded = dc.replace(model, fold_cap=64)
    dcs = DataParallelSampler(folded, mesh, num_steps=3, embedding_scale=2.0,
                              per_chip_batch=1, length=L,
                              deep_cache_interval=2, deep_split=1)
    out_dc = dcs(params, onsets, emb, jax.random.key(3))
    assert out_dc.shape == (8, L) and np.isfinite(out_dc).all()


def test_onset_syncbn_mesh_equivalence():
    """sync-BN under GSPMD: the BatchNorm batch statistics are computed over
    the GLOBAL batch (XLA inserts the cross-device reduction), so one train
    step on mesh=1 and mesh=8 must produce identical running stats, loss and
    updated params — the reference's Lightning sync_batchnorm=True semantics
    (script/train_onset_model.py:19-27) with no explicit pmean anywhere."""
    import jax.numpy as jnp

    from syncfusion_tpu.core.mesh import MeshSpec
    from syncfusion_tpu.models.onset_net import VideoOnsetNet
    from syncfusion_tpu.train.onset_trainer import OnsetTrainer

    rng = np.random.default_rng(0)
    frames = rng.normal(size=(8, 4, 32, 32, 3)).astype(np.float32)
    labels = (rng.uniform(size=(8, 4)) > 0.7).astype(np.float32)
    batch = {"frames": frames, "label": labels}

    results = {}
    for n in (1, 8):
        mesh = create_mesh(MeshSpec(data=n, model=1), devices=jax.devices()[:n])
        trainer = OnsetTrainer(VideoOnsetNet(layers=(1, 1, 1, 1)), mesh=mesh)
        state = trainer.init(jax.random.key(0), frames_shape=(1, 4, 32, 32, 3))
        state, metrics, logits = trainer.train_step(state, batch, np.uint32(0))
        results[n] = (
            jax.tree.map(np.asarray, state.batch_stats),
            float(metrics["loss/train"]),
            np.asarray(logits),
            jax.tree.map(np.asarray, state.params),
        )

    stats1, loss1, logits1, params1 = results[1]
    stats8, loss8, logits8, params8 = results[8]
    assert abs(loss1 - loss8) < 1e-5
    np.testing.assert_allclose(logits1, logits8, atol=1e-4)
    for (p1, a), (p8, b) in zip(
        jax.tree_util.tree_leaves_with_path(stats1),
        jax.tree_util.tree_leaves_with_path(stats8),
    ):
        assert p1 == p8
        np.testing.assert_allclose(
            a, b, atol=1e-5, err_msg=f"batch stat diverged: {jax.tree_util.keystr(p1)}"
        )
    # NOTE: post-Adam params are NOT compared — Adam's m/√v normalizes
    # near-zero gradients to ±lr, so float reassociation across the 8-way
    # reduction can flip a tiny gradient's sign and show up as a full ±2·lr
    # param delta.  Loss/logits/batch-stats equality above is the actual
    # sync-BN + global-grad contract.


def test_fsdp_shards_state_and_matches_replicated():
    """FSDP/TP over the 2-D (data=2, model=4) mesh: params, grads and Adam
    state live sharded over ``model`` (1/4 per-device memory) while the
    train-step numerics match the replicated-DP mesh bit-for-bit at loss
    level — GSPMD inserts the param all-gathers / grad reduce-scatters, no
    explicit collective in the framework (SURVEY §2.5 scaling contract)."""
    import jax.numpy as jnp

    from syncfusion_tpu.core.mesh import MODEL_AXIS, MeshSpec, fsdp_param_specs
    from syncfusion_tpu.train.diffusion_trainer import DiffusionTrainer, OptimizerConfig

    model = SyncFusionDiffusion(unet=UNet1d(**UNET), onsets_encoder=Encoder1d(**ENC))
    params = model.init(jax.random.key(0), L, batch=1)

    rng = np.random.default_rng(0)
    onsets = np.zeros((8, L, 1), np.float32)
    onsets[:, rng.integers(0, L, size=8), 0] = 1.0
    batch = {
        "wav": rng.normal(size=(8, L, 1)).astype(np.float32),
        "onsets": onsets,
        "embedding": rng.normal(size=(8, 1, 8)).astype(np.float32),
    }

    from syncfusion_tpu.core.mesh import shard_batch

    # replicated-DP reference (own copy: train_step donates its state)
    mesh_dp = create_mesh(MeshSpec(data=8, model=1))
    tr_dp = DiffusionTrainer(model, OptimizerConfig(), mesh=mesh_dp)
    s_dp = tr_dp.create_state(jax.tree.map(jnp.array, params))
    s_dp, m_dp = tr_dp.train_step(s_dp, shard_batch(batch, mesh_dp), jax.random.key(1))

    # FSDP on (data=2, model=4); tiny test model => tiny sharding threshold
    mesh = create_mesh(MeshSpec(data=2, model=4))
    tr = DiffusionTrainer(model, OptimizerConfig(), mesh=mesh, fsdp=True,
                          fsdp_min_size=256)
    state = tr.create_state(params)

    # the big leaves must actually be sharded over `model`, params AND both
    # Adam moments (1/4 of the bytes per device)
    def sharded_leaves(tree):
        out = []
        for x in jax.tree_util.tree_leaves(tree):
            spec = getattr(getattr(x, "sharding", None), "spec", ())
            if any(ax == MODEL_AXIS for ax in spec if ax is not None):
                out.append(x)
        return out

    from jax.sharding import PartitionSpec

    specs = fsdp_param_specs(params, mesh, min_size=256)
    spec_leaves = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda s: isinstance(s, PartitionSpec)
    )
    n_expected = sum(1 for s in spec_leaves if any(ax == MODEL_AXIS for ax in s))
    assert n_expected > 0
    p_sharded = sharded_leaves(state.params)
    assert len(p_sharded) == n_expected
    for x in p_sharded:
        assert x.addressable_shards[0].data.size == x.size // 4
    assert len(sharded_leaves(state.opt_state)) == 2 * n_expected  # mu + nu

    state, m = tr.train_step(state, shard_batch(batch, mesh), jax.random.key(1))
    np.testing.assert_allclose(
        float(m["train_loss"]), float(m_dp["train_loss"]), rtol=1e-5
    )
    assert int(state.step) == 1

    # second step runs (donation + carried shardings stay consistent)
    state, m2 = tr.train_step(state, shard_batch(batch, mesh), jax.random.key(2))
    assert np.isfinite(float(m2["train_loss"]))
    # eval path under the same shardings
    ev = tr.eval_step(state, shard_batch(batch, mesh), jax.random.key(3))
    assert np.isfinite(float(ev["valid_loss"]))


def test_gpt_fsdp_matches_replicated():
    """Stage-2 GPT trainer on the 2-D (data=2, model=4) mesh with FSDP:
    trainable GPT params, Adam state AND the frozen VQ/video stack live
    sharded over ``model`` while train/eval losses match the replicated-DP
    mesh — same contract as the diffusion trainer, via the shared
    train/sharding.ShardedStep."""
    import jax.numpy as jnp

    from syncfusion_tpu.core.mesh import MODEL_AXIS, MeshSpec, shard_batch
    from syncfusion_tpu.models.mingpt import GPTConfig, GPTFeats
    from syncfusion_tpu.models.transformer_av import AVCondTransformer
    from syncfusion_tpu.models.vqgan.model import SpecVQGAN, VQModel
    from syncfusion_tpu.train.transformer_trainer import TransformerTrainer

    tiny_vq = VQModel(embed_dim=16, n_embed=32, ch=8, ch_mult=(1, 2, 2),
                      num_res_blocks=1, attn_resolutions=(10,), resolution=40,
                      z_channels=16)
    gpt = GPTFeats(GPTConfig(vocab_size=32, block_size=128, n_layer=1,
                             n_head=2, n_embd=16))
    model = AVCondTransformer(first_stage=SpecVQGAN(tiny_vq), gpt=gpt)
    params = model.init(jax.random.key(0), n_frames=4)

    rng = np.random.default_rng(0)
    batch = {
        "spec": (rng.normal(size=(8, 20, 40, 1)) * 0.1).astype(np.float32),
        "cond_spec": (rng.normal(size=(8, 20, 40, 1)) * 0.1).astype(np.float32),
        "frames": rng.normal(size=(8, 4, 16, 16, 3)).astype(np.float32),
    }
    frozen = {"vq": params["vq"], "video": params["video"]}

    mesh_dp = create_mesh(MeshSpec(data=8, model=1))
    tr_dp = TransformerTrainer(model, learning_rate=1e-3, mesh=mesh_dp)
    s_dp = tr_dp.create_state(jax.tree.map(jnp.array, params))
    s_dp, m_dp = tr_dp.train_step(
        s_dp, tr_dp.place_frozen(frozen), shard_batch(batch, mesh_dp),
        np.uint32(7),
    )

    mesh = create_mesh(MeshSpec(data=2, model=4))
    tr = TransformerTrainer(model, learning_rate=1e-3, mesh=mesh, fsdp=True,
                            fsdp_min_size=256)
    state = tr.create_state(params)
    fz = tr.place_frozen(frozen)

    def n_sharded(tree):
        return sum(
            1 for x in jax.tree_util.tree_leaves(tree)
            if any(ax == MODEL_AXIS
                   for ax in getattr(x.sharding, "spec", ()) if ax is not None)
        )

    assert n_sharded(state.gpt_params) > 0
    assert n_sharded(state.opt_state) == 2 * n_sharded(state.gpt_params)
    assert n_sharded(fz) > 0  # frozen stack sharded too (1/4 resident HBM)

    state, m = tr.train_step(state, fz, shard_batch(batch, mesh), np.uint32(7))
    np.testing.assert_allclose(
        float(m["train/loss"]), float(m_dp["train/loss"]), rtol=1e-5
    )
    state, m2 = tr.train_step(state, fz, shard_batch(batch, mesh), np.uint32(8))
    assert np.isfinite(float(m2["train/loss"]))
    ev = tr.eval_step(state, fz, shard_batch(batch, mesh))
    assert np.isfinite(float(ev["val/loss"]))
