"""Demo video utils (eval/video_utils.py) driven through stub
ffmpeg/ffprobe binaries (the real ones are absent from this image)."""

import os
import stat
from pathlib import Path

import numpy as np
import pytest

from syncfusion_tpu.eval.video_utils import (
    get_duration,
    load_frames,
    reencode_video_with_diff_fps,
    trim_video,
)


@pytest.fixture()
def stub_bin(tmp_path, monkeypatch):
    """PATH dir with scriptable ffmpeg/ffprobe stubs."""
    bindir = tmp_path / "bin"
    bindir.mkdir()

    def install(name: str, script: str):
        p = bindir / name
        p.write_text("#!/bin/sh\n" + script)
        p.chmod(p.stat().st_mode | stat.S_IEXEC)

    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    return install


def test_get_duration(stub_bin, tmp_path):
    stub_bin("ffprobe", "echo 3.5\n")
    stub_bin("ffmpeg", "exit 0\n")
    assert get_duration(tmp_path / "v.mp4") == 3.5


def test_trim_video_naming_and_guard(stub_bin, tmp_path):
    stub_bin("ffprobe", "echo 10.0\n")
    # ffmpeg stub: touch the last argument (the output path)
    stub_bin("ffmpeg", 'for a in "$@"; do out="$a"; done\n: > "$out"\n')
    src = tmp_path / "clip.mp4"
    src.write_bytes(b"x")

    out = trim_video(src, start=2.5, trim_duration=4, tmp_path=tmp_path / "tmp")
    assert Path(out).name == "clip_trim_to_4s_from_2.5000.mp4"
    assert Path(out).exists()

    out_c = trim_video(src, 0.0, 2, tmp_path / "tmp", cond=True)
    assert Path(out_c).name == "clip_cond_trim_to_2s_from_0.0000.mp4"

    with pytest.raises(AssertionError):
        trim_video(src, start=99.0, tmp_path=tmp_path / "tmp")


def test_reencode_with_diff_fps(stub_bin, tmp_path):
    stub_bin("ffprobe", "echo 10.0\n")
    stub_bin("ffmpeg", 'for a in "$@"; do out="$a"; done\n: > "$out"\n')
    src = tmp_path / "clip.mp4"
    src.write_bytes(b"x")
    out = reencode_video_with_diff_fps(src, tmp_path / "tmp", 15)
    assert Path(out).name == "clip_new_fps.mp4" and Path(out).exists()


def test_load_frames_rgb_pipe(stub_bin, tmp_path):
    # 2 frames of 4x3 RGB: bytes 0..71
    raw = bytes(range(72))
    raw_file = tmp_path / "raw.bin"
    raw_file.write_bytes(raw)
    stub_bin("ffprobe", "echo 4,3\n")
    stub_bin("ffmpeg", f'cat "{raw_file}"\n')

    frames = load_frames(tmp_path / "v.mp4")
    assert len(frames) == 2
    assert frames[0].shape == (3, 4, 3) and frames[0].dtype == np.uint8
    assert frames[0][0, 0, 0] == 0 and frames[1][0, 0, 0] == 36


def test_ffmpeg_error_is_surfaced(stub_bin, tmp_path):
    stub_bin("ffprobe", "echo 10.0\n")
    stub_bin("ffmpeg", "echo 'boom: no such filter' >&2\nexit 1\n")
    src = tmp_path / "clip.mp4"
    src.write_bytes(b"x")
    with pytest.raises(RuntimeError, match="no such filter"):
        reencode_video_with_diff_fps(src, tmp_path / "tmp", 15)
