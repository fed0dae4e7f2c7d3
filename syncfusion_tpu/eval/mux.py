"""Mux generated audio back onto source video (demo/paper-style outputs).

TPU-native equivalent of the reference's moviepy muxer
(CondFoleyGen/audio_generation_utils.py:61-92 ``attach_audio_to_video``):
trim the source video to the generation window, force the model fps, attach
the generated wav, and optionally burn an "Original/Generated Audio" label.
moviepy isn't in this image — the preprocessing layer already shells out to
ffmpeg (script/gh_preprocess_videos.py), so this does too.
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path
from typing import Optional


def have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def attach_audio_to_video(
    video_path: str | Path,
    audio_path: str | Path,
    dest: str | Path,
    fps: int = 15,
    video_start_in_seconds: float = 0.0,
    video_duration_in_seconds: float = 2.0,
    put_text: bool = False,
    text_start_frame: int = 0,
    recon_only: bool = False,
) -> Path:
    """Write ``dest`` = trimmed ``video_path`` with ``audio_path`` as its
    audio track.  Mirrors the reference muxer's arguments; text burning uses
    ffmpeg drawtext (frame-gated like the reference's per-frame cv2.putText).
    """
    if not have_ffmpeg():
        raise RuntimeError("ffmpeg not found on PATH — cannot mux video")
    dest = Path(dest)
    dest.parent.mkdir(parents=True, exist_ok=True)

    filters = [f"fps={fps}"]
    if put_text:
        if recon_only:
            filters.append(_drawtext("Reconstructed Sound"))
        else:
            # frames < text_start_frame carry the original-audio label
            t_switch = text_start_frame / fps
            filters.append(_drawtext("Original Audio", f"lt(t,{t_switch:.4f})"))
            filters.append(_drawtext("Generated Audio", f"gte(t,{t_switch:.4f})"))

    cmd = [
        "ffmpeg", "-y", "-loglevel", "error",
        "-ss", f"{video_start_in_seconds:.3f}",
        "-t", f"{video_duration_in_seconds:.3f}",
        "-i", str(video_path),
        "-i", str(audio_path),
        "-map", "0:v:0", "-map", "1:a:0",
        "-vf", ",".join(filters),
        "-c:v", "libx264", "-pix_fmt", "yuv420p",
        "-c:a", "aac", "-shortest",
        str(dest),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError as e:
        # Surface ffmpeg's diagnostics (e.g. drawtext failing when no
        # fontconfig font is available) instead of an opaque exit code.
        stderr = (e.stderr or b"").decode(errors="replace").strip()
        raise RuntimeError(f"ffmpeg mux failed (rc={e.returncode}): {stderr}") from e
    return dest


def _drawtext(text: str, enable: Optional[str] = None) -> str:
    d = (
        f"drawtext=text='{text}':x=w/50:y=h/6:fontsize=h/12:fontcolor=red"
    )
    if enable:
        d += f":enable='{enable}'"
    return d
