"""CondFoleyGen baseline: dataset semantics + stage-2 trainer on tiny nets."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from syncfusion_tpu.data.baseline_dataset import (
    CondGreatestHitsWaveCondOnImage,
    GreatestHitsWaveDataset,
    baseline_loader,
)
from syncfusion_tpu.ops.wav import write_wav

SR = 8000
FPS = 5


@pytest.fixture()
def gh_root(tmp_path):
    rng = np.random.default_rng(0)
    names = ["vid_a", "vid_b", "vid_c"]
    dur = 3.0
    for name in names:
        d = tmp_path / name
        (d / "audio").mkdir(parents=True)
        (d / "frames").mkdir()
        meta = {"processed": {"video_frame_rate": FPS, "video_duration": dur}}
        (d / f"{name}.metadata.json").write_text(json.dumps(meta))
        (d / f"{name}.times.csv").write_text("0.4,hit\n1.2,hit\n2.1,hit\n")
        wav = rng.normal(size=(1, int(SR * dur))).astype(np.float32) * 0.1
        write_wav(d / "audio" / f"{name}.resampled.wav", wav, SR)
        for i in range(1, int(dur * FPS) + 2):
            Image.fromarray(rng.integers(0, 255, (20, 20, 3), np.uint8)).save(
                d / "frames" / f"{name}.frame_{i:06d}.jpg"
            )
    (tmp_path / "train.txt").write_text("\n".join(names) + "\n")
    return tmp_path


def test_wave_dataset_item(gh_root):
    ds = GreatestHitsWaveDataset(
        str(gh_root), str(gh_root / "train.txt"), sample_rate=SR,
        chunk_length_in_seconds=1.0, rand_shift=True, seed=1,
    )
    assert len(ds) == 9  # 3 onsets × 3 videos
    item = ds[0]
    assert item["image"].shape == (SR,)
    assert item["image"].dtype == np.float32


def test_wave_dataset_shift_clamped(gh_root):
    ds = GreatestHitsWaveDataset(
        str(gh_root), str(gh_root / "train.txt"), sample_rate=SR,
        chunk_length_in_seconds=1.0, rand_shift=True, seed=2,
    )
    for i in range(len(ds)):
        item = ds[i]  # must never index past the audio end
        assert item["image"].shape == (SR,)


def test_cond_dataset_features_and_outside_cond(gh_root):
    ds = CondGreatestHitsWaveCondOnImage(
        str(gh_root), str(gh_root / "train.txt"), sample_rate=SR,
        chunk_length_in_seconds=1.0, rand_shift=False,
        p_outside_cond=1.0, frame_size=16, seed=3,
    )
    item = ds[0]
    n_frames = int(1.0 * FPS)
    assert item["feature"].shape == (2 * n_frames, 16, 16, 3)
    assert item["cond_image"].shape == (SR,)
    # p_outside_cond=1 → conditioning comes from a different video
    assert item["file_path_cond_wav_"] != item["file_path_wav_"]


def test_cond_dataset_same_video_cond(gh_root):
    ds = CondGreatestHitsWaveCondOnImage(
        str(gh_root), str(gh_root / "train.txt"), sample_rate=SR,
        chunk_length_in_seconds=1.0, rand_shift=False,
        p_outside_cond=0.0, frame_size=16, seed=4,
    )
    item = ds[0]
    assert item["file_path_cond_wav_"] == item["file_path_wav_"]


def test_baseline_loader_batches(gh_root):
    ds = GreatestHitsWaveDataset(
        str(gh_root), str(gh_root / "train.txt"), sample_rate=SR,
        chunk_length_in_seconds=1.0, seed=0,
    )
    batches = list(baseline_loader(ds, 4, shuffle=True, drop_last=False))
    assert sum(b["image"].shape[0] for b in batches) == 9


def test_transformer_trainer_tiny_step():
    """Stage-2 trainer: loss decreases on a fixed tiny batch; frozen parts
    (VQ codebook) stay untouched."""
    from syncfusion_tpu.models.mingpt import GPTConfig, GPTFeats
    from syncfusion_tpu.models.transformer_av import AVCondTransformer
    from syncfusion_tpu.models.vqgan.model import SpecVQGAN, VQModel
    from syncfusion_tpu.train.transformer_trainer import TransformerTrainer, decay_mask

    tiny_vq = VQModel(embed_dim=16, n_embed=32, ch=8, ch_mult=(1, 2, 2),
                      num_res_blocks=1, attn_resolutions=(10,), resolution=40,
                      z_channels=16)
    # 20×40 spec → 5×10 grid → clip 50; block must cover feats + 2·clip − 1
    gpt = GPTFeats(GPTConfig(vocab_size=32, block_size=128, n_layer=1,
                             n_head=2, n_embd=16))
    model = AVCondTransformer(first_stage=SpecVQGAN(tiny_vq), gpt=gpt)
    params = model.init(jax.random.key(0), n_frames=4)

    rng = np.random.default_rng(0)
    batch = {
        "spec": jnp.asarray(rng.normal(size=(2, 20, 40, 1)).astype(np.float32) * 0.1),
        "cond_spec": jnp.asarray(rng.normal(size=(2, 20, 40, 1)).astype(np.float32) * 0.1),
        "frames": jnp.asarray(rng.normal(size=(2, 4, 16, 16, 3)).astype(np.float32)),
    }
    trainer = TransformerTrainer(model, learning_rate=1e-3)
    state = trainer.create_state(params)
    frozen = {"vq": params["vq"], "video": params["video"]}

    codebook_before = np.asarray(params["vq"]["params"]["quantize"]["embedding"])
    losses = []
    for i in range(3):
        state, metrics = trainer.train_step(state, frozen, batch, jax.random.key(i))
        losses.append(float(metrics["train/loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    np.testing.assert_array_equal(
        codebook_before, np.asarray(frozen["vq"]["params"]["quantize"]["embedding"])
    )
    # decay mask: kernels decay, embeddings/norms don't
    mask = decay_mask(state.gpt_params)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    kernel_flags = [v for p, v in flat if "kernel" in str(p)]
    other_flags = [v for p, v in flat if "kernel" not in str(p)]
    assert all(kernel_flags) and not any(other_flags)
