import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from syncfusion_tpu.data.onset_dataset import GreatestHitsDataset, loader, natsorted
from syncfusion_tpu.data.transforms import (
    FrameTransform,
    adjust_hue,
    color_jitter,
    normalize,
    resize,
)

FPS = 15


@pytest.fixture()
def gh_root(tmp_path):
    """Synthesize the preprocessed Greatest Hits layout for 2 videos."""
    rng = np.random.default_rng(0)
    names = []
    for v in range(2):
        name = f"2015-02-16-{v}"
        names.append(name)
        d = tmp_path / name
        (d / "frames").mkdir(parents=True)
        duration = 4.5  # → 2 chunks of 2 s
        meta = {"processed": {"video_frame_rate": FPS, "video_duration": duration}}
        (d / f"{name}.metadata.json").write_text(json.dumps(meta))
        (d / f"{name}.times.csv").write_text("0.5,hit\n1.9,hit\n2.5,scratch\n4.4,hit\n")
        n_frames = int(duration * FPS) + 1
        for i in range(1, n_frames + 1):
            img = Image.fromarray(rng.integers(0, 255, (24, 32, 3), np.uint8))
            img.save(d / "frames" / f"frame_{i:06d}.jpg")
    (tmp_path / "train.txt").write_text("\n".join(names) + "\n")
    return tmp_path


def test_natsorted():
    assert natsorted(["f_10", "f_2", "f_1"]) == ["f_1", "f_2", "f_10"]


def test_dataset_chunking_and_labels(gh_root):
    ds = GreatestHitsDataset(
        str(gh_root), str(gh_root / "train.txt"),
        frames_transforms=FrameTransform(augment=False, size=16),
    )
    # 4.5 s → 2 chunks per video × 2 videos
    assert len(ds) == 4
    item = ds[0]
    assert item["frames"].shape == (30, 16, 16, 3)
    assert item["label"].shape == (30,)
    # onsets at 0.5 s (frame 7) and 1.9 s (frame 28) in chunk 0
    np.testing.assert_array_equal(np.nonzero(item["label"])[0], [7, 28])
    # chunk 1: onset at 2.5 s → frame int(0.5*15)=7; 4.4 s is outside chunk 1
    item1 = ds[1]
    np.testing.assert_array_equal(np.nonzero(item1["label"])[0], [7])
    assert item["start_frame"] == 0 and item1["start_frame"] == 30


def test_dataset_augment_shapes(gh_root):
    ds = GreatestHitsDataset(
        str(gh_root), str(gh_root / "train.txt"),
        frames_transforms=FrameTransform(augment=True, size=16, resize_to=20),
    )
    item = ds[0]
    assert item["frames"].shape == (30, 16, 16, 3)


def test_loader_batches(gh_root):
    ds = GreatestHitsDataset(
        str(gh_root), str(gh_root / "train.txt"),
        frames_transforms=FrameTransform(augment=False, size=16),
    )
    batches = list(loader(ds, batch_size=3, shuffle=True, num_workers=2))
    assert batches[0]["frames"].shape == (3, 30, 16, 16, 3)
    assert batches[0]["label"].shape == (3, 30)
    assert sum(b["frames"].shape[0] for b in batches) == 4


def test_transforms_normalize_and_resize():
    frames = np.full((2, 8, 10, 3), 0.5, np.float32)
    out = resize(frames, 4)  # short side 4 → (4, 5)
    assert out.shape == (2, 4, 5, 3)
    normed = normalize(frames)
    assert abs(float(normed[0, 0, 0, 0]) - (0.5 - 0.485) / 0.229) < 1e-5


def test_hue_rotation_identity():
    rng = np.random.default_rng(3)
    x = rng.random((1, 4, 4, 3)).astype(np.float32)
    np.testing.assert_allclose(adjust_hue(x, 0.0), x, atol=1e-5)
    # full rotation returns to start
    np.testing.assert_allclose(adjust_hue(x, 1.0), x, atol=1e-4)


def test_color_jitter_deterministic_with_seed():
    x = np.random.default_rng(1).random((2, 6, 6, 3)).astype(np.float32)
    a = color_jitter(x, np.random.default_rng(5), 0.4, 0.2, 0.4, 0.1)
    b = color_jitter(x, np.random.default_rng(5), 0.4, 0.2, 0.4, 0.1)
    np.testing.assert_array_equal(a, b)


def test_wire_uint8_matches_f32_path():
    """uint8 wire format + on-device normalize ≡ host-side Normalize within
    the 1/255 quantization step (the frames originate from 8-bit video)."""
    import jax.numpy as jnp

    from syncfusion_tpu.train.onset_trainer import OnsetTrainer

    x = np.random.default_rng(0).random((2, 6, 6, 3)).astype(np.float32)
    t_f32 = FrameTransform(augment=False, size=6)
    t_u8 = FrameTransform(augment=False, size=6, wire_uint8=True)
    ref = t_f32(x)
    wire = t_u8(x)
    assert wire.dtype == np.uint8
    dev = np.asarray(OnsetTrainer._prep_frames(jnp.asarray(wire)))
    # max error: 0.5/255 pixel quantization amplified by 1/std (≥ 1/0.229)
    assert np.max(np.abs(dev - ref)) < (0.5 / 255.0) / 0.224 + 1e-5
    # float inputs pass through untouched
    np.testing.assert_array_equal(
        np.asarray(OnsetTrainer._prep_frames(jnp.asarray(ref))), ref
    )


def test_wire_yuv420_matches_f32_path():
    """Packed 4:2:0 wire + on-device decode ≡ host Normalize on
    chroma-smooth content (constant 2×2 blocks → the subsample is exact and
    only the uint8 quantization of Y/Pb/Pr remains).  VERDICT r4 #6: this
    wire is HALF the uint8 RGB bytes over the ~25 MB/s tunnel."""
    import jax.numpy as jnp

    from syncfusion_tpu.train.onset_trainer import OnsetTrainer

    rng = np.random.default_rng(0)
    # piecewise-constant 2x2 blocks: chroma subsampling loses nothing
    x = np.repeat(np.repeat(rng.random((2, 4, 4, 3)), 2, 1), 2, 2).astype(np.float32)
    t_f32 = FrameTransform(augment=False, size=8)
    t_yuv = FrameTransform(augment=False, size=8, wire_yuv420=True)
    ref = t_f32(x)
    wire = t_yuv(x)
    assert wire.dtype == np.uint8 and wire.shape == (2, 12, 8)
    assert wire.nbytes * 2 == x.size  # half the bytes of the uint8 RGB wire
    dev = np.asarray(OnsetTrainer._prep_frames(jnp.asarray(wire)))
    assert dev.shape == ref.shape
    # error budget: uint8 quantization of Y + Pb + Pr propagated through the
    # color matrix (|coef| sums ≈ 3.6) and 1/std normalization
    assert np.max(np.abs(dev - ref)) < 3.6 * (0.5 / 255.0) / 0.224 + 1e-5

    # arbitrary (non-smooth) content: decode still bounded — chroma detail
    # above Nyquist is gone but luma survives to quantization
    x2 = rng.random((1, 8, 8, 3)).astype(np.float32)
    wire2 = t_yuv(x2)
    rgb2 = np.asarray(OnsetTrainer._yuv420_to_rgb(jnp.asarray(wire2)))
    y_ref = x2 @ np.array([0.299, 0.587, 0.114], np.float32)
    y_got = rgb2 @ np.array([0.299, 0.587, 0.114], np.float32)
    assert np.max(np.abs(y_got - y_ref)) < 2.5 / 255.0


def test_train_step_on_yuv420_wire():
    """End-to-end: the jitted train step accepts the packed 4:2:0 wire with
    the on-device ColorJitter augment (the augment-recipe serving shape)."""
    import jax
    import jax.numpy as jnp

    from syncfusion_tpu.models.onset_net import VideoOnsetNet
    from syncfusion_tpu.train.onset_trainer import OnsetTrainer

    rng = np.random.default_rng(1)
    frames = rng.random((2, 4, 16, 16, 3)).astype(np.float32)
    packed = np.stack([FrameTransform(size=16, wire_yuv420=True)(f)
                       for f in frames])
    assert packed.shape == (2, 4, 24, 16)
    labels = (rng.uniform(size=(2, 4)) > 0.7).astype(np.float32)

    trainer = OnsetTrainer(VideoOnsetNet(layers=(1, 1, 1, 1)),
                           jitter=(0.4, 0.2, 0.4, 0.1))
    state = trainer.init(jax.random.key(0), frames_shape=(1, 4, 16, 16, 3))
    state, metrics, logits = trainer.train_step(
        state, {"frames": packed, "label": labels}, np.uint32(7))
    assert np.isfinite(float(metrics["loss/train"]))
    assert np.asarray(logits).shape == (2, 4)

    # eval forward on the same wire
    out = np.asarray(trainer.forward(state, jnp.asarray(packed)))
    assert out.shape == (2, 4) and np.isfinite(out).all()
