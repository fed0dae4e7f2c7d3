"""Audio augmentations for baseline training.

Reference equivalents (CondFoleyGen/specvqgan/data/transforms.py):
``NormalizeAudio`` (scale to target RMS 0.1) and ``PitchShift``
(torch_pitch_shift, ±12 semitones, applied w.p. ``p_audio_aug`` in the
stage-2 transformer's train-time wav→spec path,
av_cond_transformer.py:85-108).

Pitch shift = phase-vocoder time-stretch + polyphase resample (numpy,
host-side augmentation).
"""

from __future__ import annotations

import numpy as np


def normalize_audio(y: np.ndarray, desired_rms: float = 0.1,
                    eps: float = 1e-4) -> np.ndarray:
    rms = max(float(np.sqrt(np.mean(np.square(y)))), eps)
    return (y * (desired_rms / rms)).astype(np.float32)


def _stft_np(y, n_fft=1024, hop=256):
    pad = n_fft // 2
    y = np.pad(y, (pad, pad), mode="reflect")
    n = 1 + (len(y) - n_fft) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(n_fft)[None, :]
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    return np.fft.rfft(y[idx] * window, axis=-1).T  # (freq, frames)


def _istft_np(spec, hop=256, length=None):
    n_fft = 2 * (spec.shape[0] - 1)
    frames = np.fft.irfft(spec.T, n=n_fft, axis=-1)
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    frames = frames * window
    total = n_fft + hop * (frames.shape[0] - 1)
    y = np.zeros(total)
    wsum = np.zeros(total)
    for i, fr in enumerate(frames):
        y[i * hop : i * hop + n_fft] += fr
        wsum[i * hop : i * hop + n_fft] += window**2
    y = y / np.maximum(wsum, 1e-10)
    y = y[n_fft // 2 :]
    if length is not None:
        y = y[:length] if len(y) >= length else np.pad(y, (0, length - len(y)))
    return y.astype(np.float32)


def time_stretch(y: np.ndarray, rate: float, n_fft: int = 1024,
                 hop: int = 256) -> np.ndarray:
    """Phase-vocoder time stretch by ``rate`` (>1 = faster/shorter)."""
    spec = _stft_np(y, n_fft, hop)
    n_freq, n_frames = spec.shape
    steps = np.arange(0, n_frames, rate)
    phi_advance = np.linspace(0, np.pi * hop, n_freq)

    out = np.zeros((n_freq, len(steps)), complex)
    phase_acc = np.angle(spec[:, 0])
    for t, step in enumerate(steps):
        i = int(step)
        frac = step - i
        cols = spec[:, i : i + 2]
        if cols.shape[1] < 2:
            cols = np.pad(cols, ((0, 0), (0, 2 - cols.shape[1])))
        mag = (1 - frac) * np.abs(cols[:, 0]) + frac * np.abs(cols[:, 1])
        out[:, t] = mag * np.exp(1j * phase_acc)
        dphase = np.angle(cols[:, 1]) - np.angle(cols[:, 0]) - phi_advance
        dphase = dphase - 2 * np.pi * np.round(dphase / (2 * np.pi))
        phase_acc = phase_acc + phi_advance + dphase
    return _istft_np(out, hop, length=int(round(len(y) / rate)))


def pitch_shift(y: np.ndarray, sr: int, n_steps: float) -> np.ndarray:
    """Shift pitch by ``n_steps`` semitones, preserving duration."""
    if n_steps == 0:
        return np.asarray(y, np.float32)
    rate = 2.0 ** (-n_steps / 12.0)
    stretched = time_stretch(y, rate)
    # Resample back to the original duration.  The ratio is irrational for
    # fractional semitones (a polyphase bank would need thousands of
    # phases), so use linear interpolation — fine for augmentation.
    src = np.arange(len(stretched)) * rate
    tgt = np.arange(len(y), dtype=np.float64)
    shifted = np.interp(tgt, src, stretched)
    return shifted.astype(np.float32)


def random_audio_augment(
    y: np.ndarray, sr: int, rng: np.random.Generator,
    p: float = 0.5, max_semitones: float = 12.0,
) -> np.ndarray:
    """The stage-2 train-time augmentation: w.p. ``p`` apply RMS
    normalization + a uniform ±max_semitones pitch shift."""
    if rng.random() >= p:
        return y
    y = normalize_audio(y)
    steps = float(rng.uniform(-max_semitones, max_semitones))
    return pitch_shift(y, sr, steps)
