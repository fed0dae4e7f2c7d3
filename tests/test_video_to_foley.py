"""End-to-end video→foley pipeline smoke (tiny nets, synthetic frames)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "script"))


@pytest.mark.slow
def test_video_to_foley_pipeline(tmp_path, monkeypatch):
    import video_to_foley

    # synthetic preprocessed video
    rng = np.random.default_rng(0)
    name = "demo_vid"
    d = tmp_path / name
    (d / "frames").mkdir(parents=True)
    fps, dur = 5, 2.2
    (d / f"{name}.metadata.json").write_text(json.dumps(
        {"processed": {"video_frame_rate": fps, "video_duration": dur}}))
    (d / f"{name}.times.csv").write_text("0.5,hit\n")
    for i in range(1, int(dur * fps) + 2):
        Image.fromarray(rng.integers(0, 255, (24, 24, 3), np.uint8)).save(
            d / "frames" / f"frame_{i:06d}.jpg")

    # monkeypatch the pipeline sizes down for CPU
    monkeypatch.setattr(video_to_foley, "LENGTH", 1024)
    out = tmp_path / "foley.wav"
    video_to_foley.main([
        "--video_dir", str(d),
        "--output", str(out),
        "--num_steps", "2",
        "--onset_layers", "1", "1", "1", "1",
        "--override", "model.model.channels=[4,8,16]",
        "--override", "model.model.factors=[1,4,4]",
        "--override", "model.model.items=[1,1,1]",
        "--override", "model.model.attentions=[0,0,1]",
        "--override", "model.model.cross_attentions=[1,1,1]",
        "--override", "model.model.context_channels=[2,8,16]",
        "--override", "model.model.attention_heads=2",
        "--override", "model.model.attention_features=4",
        "--override", "model.model.embedding_features=8",
        "--override", "model.onsets_encoder.multipliers=[1,1,4,8]",
        "--override", "model.onsets_encoder.factors=[1,4,4]",
        "--override", "model.onsets_encoder.num_blocks=[1,1,1]",
        "--override", "model.embedder=null",
    ])
    assert out.exists()
    from syncfusion_tpu.ops.wav import read_wav

    wav, sr = read_wav(out)
    assert sr == 48000 and wav.shape[1] == 1024
