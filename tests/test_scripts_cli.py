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


def test_gh_preprocess_videos_cli(tmp_path, monkeypatch):
    """Drive script/gh_preprocess_videos.py end-to-end with stub
    ffmpeg/ffprobe binaries (the real ones aren't in this image): metadata,
    resampled audio, spectral-gate denoise, onset track, frames."""
    import subprocess

    rng = np.random.default_rng(3)
    sr = 8000
    # "Extracted" audio the ffmpeg stub will copy to any requested .wav
    noisy = np.zeros((1, sr * 2), np.float32)
    noisy[0, sr // 2 : sr // 2 + 400] = np.sin(
        2 * np.pi * 660 * np.arange(400) / sr
    ).astype(np.float32)
    noisy += rng.normal(size=noisy.shape).astype(np.float32) * 0.02
    src_wav = tmp_path / "source.wav"
    write_wav(src_wav, noisy, sr)

    bindir = tmp_path / "bin"
    bindir.mkdir()
    probe_json = json.dumps({
        "streams": [
            {"codec_type": "video", "width": 320, "height": 240,
             "avg_frame_rate": "15/1", "duration": "2.0", "nb_frames": "30"},
            {"codec_type": "audio", "sample_rate": "44100", "channels": "2",
             "duration": "2.0"},
        ]
    })
    (bindir / "ffprobe").write_text(f"#!/bin/sh\ncat <<'EOF'\n{probe_json}\nEOF\n")
    # ffmpeg stub: wav output → copy the prepared file; jpg pattern → touch 30
    (bindir / "ffmpeg").write_text(
        "#!/bin/sh\n"
        "out=''\nfor a in \"$@\"; do out=\"$a\"; done\n"
        "case \"$out\" in\n"
        f"  *.wav) cp {src_wav} \"$out\" ;;\n"
        "  *.jpg) i=1; while [ $i -le 30 ]; do\n"
        "    p=$(printf \"$out\" $i 2>/dev/null || echo \"$out.$i\");\n"
        "    : > \"$p\"; i=$((i+1)); done ;;\n"
        "esac\n"
    )
    for f in bindir.iterdir():
        f.chmod(0o755)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    videos = tmp_path / "videos"
    videos.mkdir()
    (videos / "vid1.mp4").write_bytes(b"fake")
    (tmp_path / "out").mkdir()
    # hit_record.csv for the onset-track branch lives in the per-video out dir
    (tmp_path / "out" / "vid1").mkdir()
    (tmp_path / "out" / "vid1" / "hit_record.csv").write_text("0.5,hit\n1.0,hit\n")

    import gh_preprocess_videos as gpv

    gpv.main([
        "--input_dir", str(videos), "--output_dir", str(tmp_path / "out"),
        "--audio_sample_rate", str(sr), "--audio_denoise", "--audio_onsets",
        "--num_workers", "1",
    ])

    out = tmp_path / "out" / "vid1"
    meta = json.loads((out / "vid1.metadata.json").read_text())
    assert meta["original"]["video_frame_rate"] == 15.0
    assert meta["processed"]["audio_sample_rate"] == sr
    audio = out / "audio"
    assert (audio / "vid1.resampled.wav").exists()
    from syncfusion_tpu.ops.wav import read_wav

    den, dsr = read_wav(audio / "vid1.resampled_denoised.wav")
    assert dsr == sr and den.shape == noisy.shape
    # gate crushed the leading silent region's noise
    sil = slice(0, sr // 4)
    assert np.sum(den[0, sil] ** 2) < 0.05 * np.sum(noisy[0, sil] ** 2)
    onset, _ = read_wav(audio / "vid1.resampled_onset.wav")
    assert onset[0, sr // 2] == 1.0 and onset[0, sr] == 1.0
    assert len(list((out / "frames").glob("*.jpg"))) == 30


# ---------------------------------------------------------- baseline CLIs
def _make_gh_root(tmp_path, n_videos=2, fps=5, dur=3.0, sr=8000):
    """Greatest-Hits-processed layout (frames + resampled wav + times.csv)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    names = [f"vid_{chr(97 + i)}" for i in range(n_videos)]
    for name in names:
        d = tmp_path / name
        (d / "audio").mkdir(parents=True)
        (d / "frames").mkdir()
        meta = {"processed": {"video_frame_rate": fps, "video_duration": dur}}
        (d / f"{name}.metadata.json").write_text(json.dumps(meta))
        (d / f"{name}.times.csv").write_text("0.4,hit\n1.2,hit\n2.1,hit\n")
        wav = rng.normal(size=(1, int(sr * dur))).astype(np.float32) * 0.1
        write_wav(d / "audio" / f"{name}.resampled.wav", wav, sr)
        for i in range(1, int(dur * fps) + 2):
            Image.fromarray(rng.integers(0, 255, (20, 20, 3), np.uint8)).save(
                d / "frames" / f"{name}.frame_{i:06d}.jpg"
            )
    for split in ("train", "val", "test"):
        (tmp_path / f"{split}.txt").write_text("\n".join(names) + "\n")
    return tmp_path


_TINY_VQ_MODEL = {
    "embed_dim": 16, "n_embed": 32,
    "ddconfig": {"ch": 8, "ch_mult": [1, 1, 2, 2, 4], "num_res_blocks": 1,
                 "attn_resolutions": [10], "resolution": 160, "z_channels": 16},
    "lossconfig": {"disc_start": 10**9, "perceptual_weight": 0.0},
}


def _tiny_baseline_cfg(tmp_path, gh_root, **extra):
    cfg = {
        "seed": 0,
        "logs_dir": str(tmp_path / "logs"),
        "model": dict(_TINY_VQ_MODEL),
        "transformer": {"vocab_size": 32, "block_size": 128, "n_layer": 1,
                        "n_head": 2, "n_embd": 16},
        "n_frames": 20,
        "data": {
            "root_dir": str(gh_root),
            "train_split_file_path": str(gh_root / "train.txt"),
            "val_split_file_path": str(gh_root / "val.txt"),
            "test_split_file_path": str(gh_root / "test.txt"),
            "batch_size": 2, "sample_rate": 22050,
            "chunk_length_in_seconds": 2.0, "frame_size": 16,
            "p_audio_aug": 0.0,
        },
        "trainer": {"max_epochs": 1},
    }
    cfg.update(extra)
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return p


def test_train_codebook_cli_media(tmp_path):
    """Stage-1 CLI writes recon panels AND vocoded wavs (ImageLogger
    equivalent, reference image_logger.py:63-80)."""
    gh = _make_gh_root(tmp_path / "gh")
    cfg = _tiny_baseline_cfg(tmp_path, gh)

    import train_codebook

    train_codebook.main(["-c", str(cfg)])

    runs = list((tmp_path / "logs").iterdir())
    assert len(runs) == 1
    media = runs[0] / "media"
    assert list(media.glob("reconstructions_step*.png"))
    wavs = sorted(media.glob("val_*_step*.wav"))
    names = {w.name.split("_step")[0] for w in wavs}
    assert {"val_inputs_0", "val_reconstructions_0"} <= names
    from syncfusion_tpu.ops.wav import read_wav

    w, sr = read_wav(wavs[0])
    assert sr == 22050 and w.shape[-1] > 10000 and np.isfinite(w).all()


def test_train_transformer_cli_media(tmp_path):
    """Stage-2 CLI writes sample panels, ATTENTION grids and sample wavs
    (reference av_cond_transformer.log_images + image_logger)."""
    gh = _make_gh_root(tmp_path / "gh")
    cfg = _tiny_baseline_cfg(tmp_path, gh)

    import train_transformer

    train_transformer.main(["-c", str(cfg)])

    runs = list((tmp_path / "logs").iterdir())
    media = runs[0] / "media"
    assert list(media.glob("val_step*.png"))  # spec panel incl. samples
    for k in ("att_half", "att_nopix", "att_det"):
        assert list(media.glob(f"val_{k}_step*.png")), k
    assert list(media.glob("val_samples_nopix_*_step*.wav"))


def test_run_parity_dry_run(tmp_path, capsys):
    """The weights-available runbook must gate cleanly on missing files:
    every gate SKIPPED with the exact missing paths, one JSON verdict,
    exit ok (nothing failed — nothing ran)."""
    import run_parity

    rc = run_parity.main(["--ckpt_dir", str(tmp_path / "empty")])
    out = capsys.readouterr().out
    verdict = json.loads(out.strip().splitlines()[-1])
    assert rc == 0 and verdict["ok"]
    assert verdict["summary"]["SKIPPED"] == len(run_parity.GATES)
    assert verdict["summary"]["FAIL"] == 0 and verdict["summary"]["ERROR"] == 0
    for name, res in verdict["gates"].items():
        assert res["status"] == "SKIPPED" and res["missing"], name


def test_generate_audio_cli_sampling_and_style_transfer(tmp_path):
    gh = _make_gh_root(tmp_path / "gh")
    cfg = _tiny_baseline_cfg(tmp_path, gh)

    import generate_audio

    out1 = tmp_path / "gen"
    generate_audio.main([
        "--gh_testset", "-c", str(cfg), "--output_dir", str(out1),
        "--batch_size", "2", "--top_k", "16",
    ])
    # full reference artifact set (audio_generation_scripts.py:375-472):
    # gen wav, orig/cond reconstruction wavs, three muxed mp4s, three jpgs
    wavs = list((out1 / "generated_audio").glob("*_to_*.wav"))
    assert len(wavs) >= 2
    from syncfusion_tpu.ops.wav import read_wav

    w, sr = read_wav(wavs[0])
    assert sr == 22050 and np.isfinite(w).all()
    pair = wavs[0].stem
    ref, rest = pair.split("_to_")
    cond = rest.rsplit("_", 1)[0]
    assert (out1 / "generated_video" / f"{pair}.mp4").exists()
    assert (out1 / "generated_video" / f"{pair}.jpg").exists()
    assert (out1 / "orig_audio" / f"{ref}.wav").exists()
    assert (out1 / "orig_video" / f"{ref}.mp4").exists()
    assert (out1 / "orig_video" / f"{ref}.jpg").exists()
    assert (out1 / "cond_audio" / f"{cond}.wav").exists()
    assert (out1 / "cond_video" / f"{cond}.mp4").exists()
    assert (out1 / "cond_video" / f"{cond}.jpg").exists()
    # the muxed video's audio track round-trips through the native demuxer
    from syncfusion_tpu.eval.mp4 import read_mp4_audio

    vwav, vsr = read_mp4_audio(out1 / "generated_video" / f"{pair}.mp4")
    assert vsr == 22050 and np.isfinite(vwav).all()
    # the mp4's PCM track is s16 and therefore clipped to [-1, 1); the wav
    # is f32 (random-weight Griffin-Lim can exceed full scale)
    ref = np.clip(w.mean(axis=0), -1.0, 1.0 - 1.0 / 32768)
    assert np.abs(vwav[: ref.shape[-1]] - ref).max() < 1e-3

    # mp4-protocol baseline eval (reference evaluate_onset_baseline.py:17-60:
    # audio extracted straight from the videos, {A}_to_{B} matched vs {A}.mp4)
    import evaluate_onset_baseline

    import json as _json
    import contextlib, io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        evaluate_onset_baseline.main([
            "--gen_dir", str(out1 / "generated_video"),
            "--tar_dir", str(out1 / "orig_video"),
            "--multi_delta", "--delta", "0.15",
        ])
    metrics = _json.loads(buf.getvalue())
    assert metrics["num_files"] >= 2
    assert 0.0 <= metrics["detection_acc"] <= 1.0

    out2 = tmp_path / "gen_style"
    generate_audio.main([
        "--gh_testset", "-c", str(cfg), "--output_dir", str(out2),
        "--batch_size", "2", "--style_transfer", "--style_steps", "5",
        "--audio_only",
    ])
    assert len(list((out2 / "generated_audio").glob("*.wav"))) >= 2
