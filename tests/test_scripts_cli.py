"""End-to-end CLI tests: the script/ entry points on synthetic data.

These are the framework's integration tests — the reference's equivalent is
running the run_*.sh pipelines against real checkpoints (SURVEY §4)."""

import io
import json
import os
import sys
import tarfile
from pathlib import Path

import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "script"))

from syncfusion_tpu.ops.wav import write_wav

REPO = Path(__file__).resolve().parents[1]
SR = 8000


def _make_shard(path, n_tracks=2, seconds=2.0, seed=0):
    rng = np.random.default_rng(seed)
    with tarfile.open(path, "w") as tf:
        for i in range(n_tracks):
            name = f"vid_{i}"
            wav = rng.normal(size=(1, int(SR * seconds))).astype(np.float32) * 0.1
            tmp = Path(path).parent / "tmp.wav"
            write_wav(tmp, wav, SR)
            data = tmp.read_bytes()
            tmp.unlink()
            info = tarfile.TarInfo(f"{name}.resampled.wav")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            csv = b"0.25,hit wood\n1.1,hit metal\n"
            info = tarfile.TarInfo(f"{name}.times.csv")
            info.size = len(csv)
            tf.addfile(info, io.BytesIO(csv))


def test_root_config_and_exp_overlays_resolve(monkeypatch):
    from syncfusion_tpu.core.config import load_config

    monkeypatch.setenv("DIR_LOGS", "/logs")
    for exp in ("train_diffusion_gh", "evaluate_gh_gen", "evaluate_gh_gen_text",
                "evaluate_gh_gen_pred", "prepare_gh_gt", "prepare_gh_gt_pred"):
        cfg = load_config(REPO / "config.yaml", [f"exp={exp}"])
        assert cfg.exp == exp
        if "train" in exp:
            assert cfg.model.model.channels[-1] == 1024
            assert cfg.datamodule.batch_size == 4
        if exp.startswith("evaluate"):
            assert cfg.experiment.num_steps == 150
            assert cfg.experiment.embedding_scale == 2.0


def test_evaluate_diffusion_prepare_gt(tmp_path):
    """prepare_gh_gt path: shard → GT wavs on disk (no model involved)."""
    import evaluate_diffusion

    shard = tmp_path / "test_shard_1.tar"
    _make_shard(shard)
    out = tmp_path / "gh-gt"
    evaluate_diffusion.main([
        "exp=prepare_gh_gt",
        f"dataset_path={shard}",
        f"experiment_path={out}",
        "sample_rate=8000",
        "length=4000",
        "experiment.downsample_rate=4000",
        "experiment.batch_size=2",
    ])
    wavs = list(out.glob("*.wav"))
    assert len(wavs) == 2  # one chunk per track


def test_evaluate_onset_cli(tmp_path, capsys):
    import evaluate_onset

    gen, tar = tmp_path / "gen", tmp_path / "tar"
    gen.mkdir(), tar.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        y = np.zeros(22050, np.float32)
        y[5000:5500] = rng.normal(size=500).astype(np.float32) * np.exp(
            -np.arange(500) / 150
        )
        write_wav(gen / f"{i}.wav", y, 22050)
        write_wav(tar / f"{i}.wav", y, 22050)
    evaluate_onset.main([f"--gen_dir={gen}", f"--tar_dir={tar}"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["detection_acc"] == 1.0


@pytest.mark.slow
def test_onset_cli_fit_and_test(tmp_path, monkeypatch):
    """Tiny end-to-end onset run: fit one epoch, test with annotations."""
    import json as json_mod

    from PIL import Image

    import train_onset_model

    # synthetic GH layout
    root = tmp_path / "gh"
    rng = np.random.default_rng(0)
    names = ["vid_a", "vid_b"]
    fps, dur = 5, 2.2
    for name in names:
        d = root / name
        (d / "frames").mkdir(parents=True)
        meta = {"processed": {"video_frame_rate": fps, "video_duration": dur}}
        (d / f"{name}.metadata.json").write_text(json_mod.dumps(meta))
        (d / f"{name}.times.csv").write_text("0.5,hit\n1.5,hit\n")
        for i in range(1, int(dur * fps) + 2):
            Image.fromarray(
                rng.integers(0, 255, (24, 24, 3), np.uint8)
            ).save(d / "frames" / f"frame_{i:06d}.jpg")
    for split in ("train", "val", "test"):
        (root / f"{split}.txt").write_text("\n".join(names) + "\n")

    cfg = {
        "data": {
            "root_dir": str(root),
            "train_split_file_path": str(root / "train.txt"),
            "val_split_file_path": str(root / "val.txt"),
            "test_split_file_path": str(root / "test.txt"),
            "chunk_length_in_seconds": 2.0,
            "augment": False,
            "batch_size": 2,
            "num_workers": 2,
            "frame_size": 16,
            "fps": fps,
        },
        "model": {
            "lr": 1e-3, "lr_beta1": 0.9, "lr_beta2": 0.999, "lr_eps": 1e-8,
            "lr_weight_decay": 1e-3, "pretrained": False,
            "layers": [1, 1, 1, 1],
        },
        "trainer": {
            "max_epochs": 1, "check_val_every_n_epoch": 1,
            "log_every_n_steps": 1, "seed": 0,
            "logs_dir": str(tmp_path / "logs"),
        },
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    train_onset_model.main(["fit", "-c", str(cfg_path)])
    runs = sorted((tmp_path / "logs").iterdir())
    assert runs, "no run dir created"
    metrics = [json.loads(l) for l in (runs[-1] / "metrics.jsonl").read_text().splitlines()]
    assert any("loss/train" in m for m in metrics)
    ckpts = sorted((runs[-1] / "ckpts").iterdir())
    assert ckpts, "no checkpoint written"

    train_onset_model.main(["test", "-c", str(cfg_path),
                            "--ckpt_path", str(runs[-1] / "ckpts")])
    runs2 = sorted((tmp_path / "logs").iterdir())
    ann = runs2[-1] / "media/annotations"
    pred_files = list((ann / "pred").glob("*.times.csv"))
    assert len(pred_files) == 2  # merged per-video prediction CSVs
    # label line plots (reference main/module_onset.py:231-261 parity)
    plots = list((runs2[-1] / "media/labels").glob("labels_*.png"))
    assert plots, "no label plots written"
