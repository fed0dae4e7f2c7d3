import numpy as np
import pytest

from syncfusion_tpu.ops.augment import (
    normalize_audio,
    pitch_shift,
    random_audio_augment,
    time_stretch,
)


def _tone(f0, sr=22050, dur=1.0):
    t = np.arange(int(sr * dur)) / sr
    return np.sin(2 * np.pi * f0 * t).astype(np.float32)


def _dominant_freq(y, sr):
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return np.argmax(spec) * sr / len(y)


def test_normalize_audio_rms():
    y = _tone(440) * 0.01
    out = normalize_audio(y)
    assert abs(float(np.sqrt(np.mean(out**2))) - 0.1) < 1e-3


def test_time_stretch_length():
    y = _tone(440)
    fast = time_stretch(y, 2.0)
    slow = time_stretch(y, 0.5)
    assert abs(len(fast) - len(y) / 2) < 512
    assert abs(len(slow) - len(y) * 2) < 512
    # stretching preserves pitch
    assert abs(_dominant_freq(fast, 22050) - 440) < 15


def test_pitch_shift_octave():
    sr = 22050
    y = _tone(440, sr)
    up = pitch_shift(y, sr, 12.0)
    assert len(up) == len(y)
    f = _dominant_freq(up[2048:-2048], sr)
    assert abs(f - 880) < 40
    down = pitch_shift(y, sr, -12.0)
    f = _dominant_freq(down[2048:-2048], sr)
    assert abs(f - 220) < 20


def test_random_audio_augment_prob():
    y = _tone(440)
    rng = np.random.default_rng(0)
    out = random_audio_augment(y, 22050, rng, p=0.0)
    np.testing.assert_array_equal(out, y)
    out = random_audio_augment(y, 22050, np.random.default_rng(1), p=1.0)
    assert out.shape == y.shape
    assert not np.array_equal(out, y)
