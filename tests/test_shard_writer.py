import json
from pathlib import Path

import numpy as np

from syncfusion_tpu.data.shard_writer import write_shards
from syncfusion_tpu.data.sfx_dataset import create_sfx_dataset
from syncfusion_tpu.data.shards import iter_tar_samples
from syncfusion_tpu.ops.wav import write_wav

SR = 8000


def _make_processed(root: Path, names):
    rng = np.random.default_rng(0)
    for name in names:
        d = root / name
        (d / "audio").mkdir(parents=True)
        wav = rng.normal(size=(1, SR * 2)).astype(np.float32) * 0.1
        write_wav(d / "audio" / f"{name}.resampled.wav", wav, SR)
        (d / f"{name}.times.csv").write_text("0.25,hit\n1.5,scratch\n")
    (root / "train.txt").write_text("\n".join(names) + "\n")


def test_write_shards_roundtrip(tmp_path):
    names = [f"vid_{i}" for i in range(5)]
    _make_processed(tmp_path, names)
    pattern = str(tmp_path / "out" / "train_shard_%d.tar")
    paths = write_shards(tmp_path, tmp_path / "train.txt", pattern, shard_size=3)
    assert len(paths) == 2  # 3 + 2 videos

    samples = list(iter_tar_samples(paths))
    assert len(samples) == 5
    assert {"resampled.wav", "times.csv"} <= set(samples[0].keys())

    # the written shards stream through the full sfx pipeline
    items = list(create_sfx_dataset(paths, sample_rate=SR, chunk_size=SR,
                                    one_chunk_per_track=True, seed=0))
    assert len(items) == 5


def test_write_shards_with_predictions(tmp_path):
    names = ["vid_0"]
    _make_processed(tmp_path, names)
    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    (pred_dir / "vid_0.times.csv").write_text("0.3000\n1.4000\n")
    pattern = str(tmp_path / "p_shard_%d.tar")
    paths = write_shards(tmp_path, tmp_path / "train.txt", pattern,
                         pred_csv_dir=pred_dir)
    sample = next(iter(iter_tar_samples(paths)))
    assert "times.pred.csv" in sample
    items = list(create_sfx_dataset(paths, sample_rate=SR, chunk_size=SR,
                                    one_chunk_per_track=True, seed=0))
    # onsets field now comes from the prediction csv
    on_idx = np.nonzero(items[0].onsets[0])[0]
    assert len(on_idx) >= 1
