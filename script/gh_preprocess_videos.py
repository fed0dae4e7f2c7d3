#!/usr/bin/env python
"""Greatest Hits video preprocessing (reference script/gh_preprocess_videos.py).

Per video (parallel worker pool): ffprobe metadata → ``{name}.metadata.json``
(original + processed sections), ffmpeg audio extraction → mono resampled
wav (f32/s24/s16), optional spectral-gate denoise, optional onset-track wav
from ``hit_record.csv``, and 15 fps frame extraction at WxH jpgs.

Requires the ffmpeg/ffprobe binaries on PATH (the only external tool the
framework shells out to, exactly like the reference).
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import multiprocessing
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _run(cmd: list[str]) -> str:
    return subprocess.run(cmd, check=True, capture_output=True, text=True).stdout


def probe(video_path: str) -> dict:
    out = _run([
        "ffprobe", "-v", "error", "-print_format", "json",
        "-show_streams", str(video_path),
    ])
    return json.loads(out)


def pipeline(
    video_path: str,
    video_suffix: str = ".mp4",
    audio_sample_rate: int = 48000,
    audio_bitdepth: int = 32,
    audio_denoise: bool = False,
    audio_onsets: bool = False,
    video_frames_per_second: int = 15,
    video_width: int = 320,
    video_height: int = 240,
    output_dir: str = "processed",
) -> None:
    import numpy as np

    from syncfusion_tpu.ops.wav import read_wav, write_wav

    name = Path(video_path).name.replace(video_suffix, "")
    out = Path(output_dir) / name
    out.mkdir(parents=True, exist_ok=True)

    meta = probe(video_path)
    streams = {s["codec_type"]: s for s in meta["streams"]}
    v, a = streams["video"], streams["audio"]
    num, den = v["avg_frame_rate"].split("/")
    metadata = {
        "original": {
            "width": int(v["width"]),
            "height": int(v["height"]),
            "video_frame_rate": float(num) / float(den),
            "video_duration": float(v["duration"]),
            "video_num_frames": int(v.get("nb_frames", 0)),
            "audio_sample_rate": int(a["sample_rate"]),
            "audio_channels": int(a["channels"]),
            "audio_duration": float(a["duration"]),
        },
        "processed": {
            "width": video_width,
            "height": video_height,
            "video_frame_rate": video_frames_per_second,
            "video_duration": float(v["duration"]),
            "video_num_frames": int(float(v["duration"]) * video_frames_per_second),
            "audio_sample_rate": audio_sample_rate,
            "audio_channels": 1,
            "audio_bitdepth": audio_bitdepth,
        },
    }
    (out / f"{name}.metadata.json").write_text(json.dumps(metadata, indent=4))

    fmt = {32: "pcm_f32le", 24: "pcm_s24le", 16: "pcm_s16le"}[audio_bitdepth]
    audio_dir = out / "audio"
    audio_dir.mkdir(exist_ok=True)
    audio_path = audio_dir / f"{name}.resampled.wav"
    _run([
        "ffmpeg", "-i", str(video_path), "-loglevel", "error",
        "-ar", str(audio_sample_rate), "-ac", "1", "-c:a", fmt,
        "-y", str(audio_path),
    ])

    if audio_denoise:
        # Native spectral gate replacing noisereduce.reduce_noise(x, sr,
        # n_fft=1024, hop_length=256) (reference gh_preprocess_videos.py:91-98).
        from syncfusion_tpu.ops.denoise import spectral_gate

        wav, sr = read_wav(audio_path)
        denoised = np.asarray(spectral_gate(wav, n_fft=1024, hop_length=256))
        fmt_name = "pcm16" if audio_bitdepth == 16 else "f32"
        write_wav(
            audio_dir / f"{name}.resampled_denoised.wav", denoised, sr, fmt=fmt_name
        )

    if audio_onsets:
        wav, sr = read_wav(audio_path)
        hits = np.loadtxt(out / "hit_record.csv", delimiter=",", usecols=0, ndmin=1)
        track = np.zeros_like(wav)
        track[:, (hits * sr).astype(int)] = 1.0
        write_wav(audio_dir / f"{name}.resampled_onset.wav", track, sr)

    frames_dir = out / "frames"
    frames_dir.mkdir(exist_ok=True)
    _run([
        "ffmpeg", "-i", str(video_path), "-loglevel", "error",
        "-filter:v",
        f"fps=fps={video_frames_per_second},scale={video_width}:{video_height}",
        "-y", str(frames_dir / f"{name}.frame_%06d.jpg"),
    ])


def _force_cpu_jax() -> None:
    """Pin worker-process jax to CPU before any backend is created.

    The denoise path (`spectral_gate`) runs jax inside every pool worker.
    On machines where a sitecustomize registers a TPU PJRT plugin, N
    workers would otherwise race to initialize the (exclusive) TPU — and
    the gate's complex-STFT ops aren't supported by that plugin anyway.
    Offline preprocessing belongs on CPU, like the reference's noisereduce.
    Must run before the first jax computation; env JAX_PLATFORMS alone is
    overridden by the sitecustomize (see core/platform.py)."""
    try:
        from syncfusion_tpu.core.platform import force_platform

        force_platform("cpu")
    except Exception:
        pass  # jax absent: ffmpeg-only preprocessing still works


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--video_suffix", default=".mp4")
    ap.add_argument("--audio_sample_rate", type=int, default=48000)
    ap.add_argument("--audio_bitdepth", type=int, default=32)
    ap.add_argument("-adn", "--audio_denoise", action="store_true")
    ap.add_argument("--audio_onsets", action="store_true")
    ap.add_argument("--video_frames_per_second", type=int, default=15)
    ap.add_argument("--video_width", type=int, default=320)
    ap.add_argument("--video_height", type=int, default=240)
    ap.add_argument("--num_workers", type=int, default=8)
    ap.add_argument("--test", action="store_true", help="process first 5 videos only")
    args = ap.parse_args(argv)

    if shutil.which("ffmpeg") is None or shutil.which("ffprobe") is None:
        sys.exit("ffmpeg/ffprobe not found on PATH — required for preprocessing")

    videos = sorted(Path(args.input_dir).glob(f"*{args.video_suffix}"))
    if args.test:
        videos = videos[:5]
    # spawn, not fork: callers may already be multi-threaded (jax/XLA spin
    # up thread pools on import) and a forked child inherits locked mutexes —
    # deadlocked the CLI test inside pytest (fork() of a 20-thread process).
    ctx = multiprocessing.get_context("spawn")
    with ProcessPoolExecutor(max_workers=args.num_workers, mp_context=ctx,
                             initializer=_force_cpu_jax) as pool:
        futures = [
            pool.submit(
                pipeline, str(v), args.video_suffix, args.audio_sample_rate,
                args.audio_bitdepth, args.audio_denoise, args.audio_onsets,
                args.video_frames_per_second, args.video_width,
                args.video_height, args.output_dir,
            )
            for v in videos
        ]
        for f in futures:
            f.result()
    print(f"processed {len(videos)} videos → {args.output_dir}")


if __name__ == "__main__":
    main()
