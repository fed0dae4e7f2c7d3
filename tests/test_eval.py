import numpy as np
import pytest

from syncfusion_tpu.eval.fad import (
    MelStatsEmbedder,
    VGGish,
    VGGishEmbedder,
    evaluate_fad,
    frechet_distance,
    gaussian_stats,
    vggish_log_mel,
)
from syncfusion_tpu.eval.onset_detect import SR, onset_detect, onset_strength
from syncfusion_tpu.eval.onset_metrics import (
    evaluate_onset_dirs,
    match_onsets,
    onset_nms,
)
from syncfusion_tpu.ops.wav import write_wav


def _click_track(times, total=2.0, sr=SR, seed=0):
    """Exponentially-decaying noise bursts at given onset times."""
    rng = np.random.default_rng(seed)
    y = np.zeros(int(total * sr), np.float32)
    for t in times:
        i = int(t * sr)
        n = min(2000, len(y) - i)
        burst = rng.normal(size=n).astype(np.float32) * np.exp(
            -np.arange(n, dtype=np.float32) / 300.0
        )
        y[i : i + n] += burst
    return y * 0.5


def test_onset_detect_finds_clicks():
    times = [0.3, 0.8, 1.4]
    y = _click_track(times)
    onsets = onset_detect(y, SR, delta=0.3) / SR
    assert len(onsets) == 3
    for t, o in zip(times, sorted(onsets)):
        assert abs(t - o) < 0.05


def test_onset_detect_silent():
    y = np.zeros(SR, np.float32)
    assert len(onset_detect(y, SR)) == 0


def test_onset_detect_end_transient_stays_in_bounds():
    # A burst at the very end can peak in the final centered-STFT frame,
    # whose sample index (frame*hop) lands past len(y); detections must be
    # clamped so match_onsets can index the wav directly (regression:
    # rehearsal stage3_onset_pred IndexError at 44544 > 44100).
    y = np.zeros(2 * SR, np.float32)
    n = 600
    y[-n:] = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    onsets = onset_detect(y, SR, delta=0.1)
    assert len(onsets) >= 1
    assert onsets.max() < len(y)
    res = match_onsets(onsets, onsets, y)  # direct indexing must not raise
    assert res["acc"] == 1.0


def test_onset_strength_peaks_at_transients():
    y = _click_track([1.0])
    env = onset_strength(y)
    peak_frame = int(np.argmax(env))
    assert abs(peak_frame * 512 / SR - 1.0) < 0.1


def test_onset_nms_suppresses_neighbors():
    onsets = np.array([1000, 1500, 30000])
    conf = [0.9, 0.5, 0.8]
    kept = onset_nms(onsets, conf, window=0.05)
    np.testing.assert_array_equal(kept, [1000, 30000])


def test_match_onsets_perfect():
    y = _click_track([0.3, 0.9])
    gt = np.array([int(0.3 * SR), int(0.9 * SR)])
    pred = gt + 200  # within delta
    res = match_onsets(gt, pred, y)
    assert res["acc"] == 1.0 and res["count_match"]


def test_match_onsets_miss():
    y = _click_track([0.3])
    gt = np.array([int(0.3 * SR), int(1.5 * SR)])
    pred = np.array([int(0.3 * SR)])
    res = match_onsets(gt, pred, y)
    assert res["acc"] == 0.5


def test_evaluate_onset_dirs(tmp_path):
    gen, tar = tmp_path / "gen", tmp_path / "tar"
    gen.mkdir(), tar.mkdir()
    for i in range(3):
        times = [0.2 + 0.1 * i, 1.0]
        write_wav(tar / f"{i}.wav", _click_track(times, seed=i), SR)
        write_wav(gen / f"{i}.wav", _click_track(times, seed=i + 10), SR)
    m = evaluate_onset_dirs(gen, tar)
    assert m["num_files"] == 3
    assert m["detection_acc"] > 0.9
    assert m["onset_count_match"] > 0.9


# ------------------------------------------------------------------- FAD
def test_frechet_distance_identity_and_separation():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 8))
    b = rng.normal(size=(500, 8)) + 3.0
    mu_a, s_a = gaussian_stats(a)
    mu_b, s_b = gaussian_stats(b)
    assert frechet_distance(mu_a, s_a, mu_a, s_a) < 1e-6
    assert frechet_distance(mu_a, s_a, mu_b, s_b) > 50.0


def test_vggish_log_mel_shapes():
    y = np.random.default_rng(0).normal(size=32000).astype(np.float32)  # 2 s @ 16 k
    patches = vggish_log_mel(y, 16000)
    assert patches.shape == (2, 96, 64)
    # resamples other rates
    y48 = np.random.default_rng(0).normal(size=96000).astype(np.float32)
    assert vggish_log_mel(y48, 48000).shape == (2, 96, 64)


def test_vggish_network_output_shape():
    import jax, jax.numpy as jnp

    net = VGGish()
    v = jax.jit(lambda: net.init(jax.random.key(0), jnp.zeros((1, 96, 64, 1))))()
    out = net.apply(v, jnp.zeros((3, 96, 64, 1)))
    assert out.shape == (3, 128)


def test_evaluate_fad_dirs_sanity(tmp_path):
    """Same-distribution dirs score (much) lower than shifted ones."""
    rng = np.random.default_rng(0)
    near, far, ref = tmp_path / "a", tmp_path / "b", tmp_path / "r"
    for d in (near, far, ref):
        d.mkdir()
    for i in range(6):
        base = rng.normal(size=32000).astype(np.float32) * 0.2
        write_wav(ref / f"{i}.wav", base, 16000)
        write_wav(near / f"{i}.wav", base + rng.normal(size=32000) * 0.01, 16000)
        write_wav(far / f"{i}.wav", base * 0.01, 16000)
    fad_near = evaluate_fad(near, ref)["fad_melstats"]
    fad_far = evaluate_fad(far, ref)["fad_melstats"]
    assert fad_near < fad_far


# ---------------------------------------------------------------------------
# AV muxing (reference attach_audio_to_video parity — eval/mux.py)
# ---------------------------------------------------------------------------

def test_mux_requires_ffmpeg(tmp_path, monkeypatch):
    from syncfusion_tpu.eval import mux

    monkeypatch.setattr(mux.shutil, "which", lambda _: None)
    with pytest.raises(RuntimeError, match="ffmpeg"):
        mux.attach_audio_to_video("a.mp4", "b.wav", tmp_path / "o.mp4")


def test_mux_roundtrip(tmp_path):
    from syncfusion_tpu.eval.mux import attach_audio_to_video, have_ffmpeg

    if not have_ffmpeg():
        pytest.skip("ffmpeg not on PATH")
    import subprocess

    src = tmp_path / "src.mp4"
    subprocess.run(
        ["ffmpeg", "-y", "-loglevel", "error", "-f", "lavfi",
         "-i", "testsrc=duration=3:size=160x120:rate=15", str(src)],
        check=True,
    )
    wav = tmp_path / "gen.wav"
    write_wav(wav, np.random.RandomState(0).randn(2 * 22050).astype(np.float32) * 0.1, 22050)
    out = attach_audio_to_video(
        src, wav, tmp_path / "out.mp4",
        video_start_in_seconds=0.5, video_duration_in_seconds=2.0,
        put_text=True, text_start_frame=15,
    )
    assert out.exists() and out.stat().st_size > 0


def test_native_mp4_roundtrip(tmp_path):
    """Native BMFF muxer (eval/mp4.py): JPEG frames + PCM audio in, audio
    track (and, via an independent demuxer stack if present, the video
    track) back out — the no-ffmpeg path for the reference's mp4 artifact
    protocol (audio_generation_utils.py:61-92)."""
    import io

    from PIL import Image

    from syncfusion_tpu.eval.mp4 import jpeg_size, read_mp4_audio, write_mp4

    rng = np.random.default_rng(0)
    frames = []
    for _ in range(10):
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, (24, 32, 3), np.uint8)).save(
            buf, "JPEG")
        frames.append(buf.getvalue())
    assert jpeg_size(frames[0]) == (32, 24)
    audio = rng.normal(size=22050).astype(np.float32) * 0.1

    dest = write_mp4(tmp_path / "clip.mp4", frames, 5.0, audio, 22050)
    wav, sr = read_mp4_audio(dest)
    assert sr == 22050 and wav.shape == audio.shape
    assert np.abs(wav - audio).max() < 1.0 / 32768 + 1e-6  # s16 quantization

    try:  # cross-check with OpenCV's (ffmpeg-based) demuxer when available
        import cv2
    except ImportError:
        return
    cap = cv2.VideoCapture(str(dest))
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 10
    assert cap.get(cv2.CAP_PROP_FPS) == 5.0
    ok, frame = cap.read()
    assert ok and frame.shape == (24, 32, 3)


def test_extract_video_audio_native(tmp_path):
    """extract_video_audio prefers the native demuxer and resamples
    (reference moviepy extraction, evaluate_onset_baseline.py:17-27)."""
    import io

    from PIL import Image

    from syncfusion_tpu.eval.mp4 import write_mp4
    from syncfusion_tpu.eval.mux import extract_video_audio

    buf = io.BytesIO()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(buf, "JPEG")
    t = np.arange(8000, dtype=np.float32) / 8000
    audio = np.sin(2 * np.pi * 440 * t).astype(np.float32) * 0.5
    dest = write_mp4(tmp_path / "c.mp4", [buf.getvalue()], 1.0, audio, 8000)

    wav = extract_video_audio(dest, sample_rate=22050)
    assert abs(wav.shape[0] - 22050) <= 2
    # energy preserved through resample (it's a pure tone well below Nyquist)
    assert abs(np.std(wav) - np.std(audio)) < 0.02


def test_concat_annotations_zero_onset_chunk(tmp_path):
    """A chunk with no onsets writes an empty CSV; merging must handle it
    silently (VERDICT r2 weak #8 — loadtxt used to warn through it)."""
    import warnings

    from syncfusion_tpu.eval.onset_annotations import concat_annotations

    d = tmp_path / "pred"
    d.mkdir()
    (d / "vid_a.0-30.times.csv").write_text("")          # zero onsets
    (d / "vid_a.30-60.times.csv").write_text("2.5000\n3.1000\n")
    with warnings.catch_warnings():
        warnings.simplefilter("error")                    # any warning fails
        concat_annotations(tmp_path)
    merged = (d / "vid_a.times.csv").read_text().split()
    assert merged == ["2.5000", "3.1000"]
    assert not list(d.glob("*.0-30.times.csv"))


def test_score_onset_pairs_empty_policy():
    """Shared per-delta scorer (eval/onset_metrics.score_onset_pairs):
    zero-onset pairs count-match False on the diffusion protocol
    (reference evaluate_onset.py:165-168) but raw length equality on the
    baseline protocol (reference evaluate_onset_baseline.py:193 counts
    cnt_match before any skip)."""
    from syncfusion_tpu.eval.onset_metrics import score_onset_pairs

    wav = np.zeros(1000, np.float32)
    empty = np.array([], int)
    some = np.array([100, 500], int)
    pairs = [(wav, empty, empty),   # both empty
             (wav, some, empty)]    # gen has onsets, gt empty

    diff = score_onset_pairs(pairs, [0.1])
    base = score_onset_pairs(pairs, [0.1], empty_count_match_when_equal=True)
    assert diff["onset_count_match"] == 0.0        # both pairs → False
    assert base["onset_count_match"] == 0.5        # (0==0) True, (2==0) False
    assert diff["detection_acc"] == base["detection_acc"] == 0.0
    assert diff["num_files"] == 2
