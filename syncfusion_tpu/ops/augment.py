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


# --------------------------------------------------------------------------
# On-device frame ColorJitter (jax) — the onset augment recipe's hot path
# --------------------------------------------------------------------------
# The reference applies torchvision ColorJitter per 30-frame chunk on the
# host (cfg/data/data-onset-greatesthit-augment.yaml:8-52, hot loop
# main/dataset_onset.py:152-165).  Host numpy jitter measured ~5 s/step at
# bs 16 (docs/REHEARSAL.md §3b) — 30× the 164 ms step compute — so the
# jitter runs INSIDE the jitted train step instead: the host ships cropped
# uint8 frames and the device draws per-sample factors AND per-sample op
# order (torchvision semantics: one draw per chunk, random op order).

def _jadjust_brightness(x, f):
    import jax.numpy as jnp

    return jnp.clip(x * f, 0.0, 1.0)


def _jadjust_contrast(x, f):
    import jax.numpy as jnp

    lum = x @ jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    gray = lum.mean(axis=(-2, -1), keepdims=True)[..., None]
    return jnp.clip(f * x + (1.0 - f) * gray, 0.0, 1.0)


def _jadjust_saturation(x, f):
    import jax.numpy as jnp

    gray = x @ jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return jnp.clip(f * x + (1.0 - f) * gray[..., None], 0.0, 1.0)


def _jadjust_hue(x, f):
    """Hue rotation by ``f`` ∈ [-0.5, 0.5] of the circle — jax port of the
    host transforms.adjust_hue (rgb→hsv→rotate→rgb)."""
    import jax.numpy as jnp

    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc, minc = x.max(-1), x.min(-1)
    v = maxc
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.maximum(maxc, 1e-8), 0.0)
    dc = jnp.maximum(deltac, 1e-8)
    rc, gc, bc = (maxc - r) / dc, (maxc - g) / dc, (maxc - b) / dc
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(deltac == 0, 0.0, h)
    h = (h + f) % 1.0
    i = jnp.floor(h * 6.0)
    frac = h * 6.0 - i
    p, q, t_ = v * (1 - s), v * (1 - s * frac), v * (1 - s * (1 - frac))
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == k for k in range(6)], [v, q, p, p, t_, v])
    g2 = jnp.select([i == k for k in range(6)], [t_, v, v, q, p, p])
    b2 = jnp.select([i == k for k in range(6)], [p, p, t_, v, v, q])
    return jnp.stack([r2, g2, b2], axis=-1).astype(x.dtype)


def color_jitter_device(frames, key, brightness: float = 0.4,
                        contrast: float = 0.2, saturation: float = 0.4,
                        hue: float = 0.1):
    """Batched on-device ColorJitter: ``frames`` (B, ..., 3) float in [0,1].

    Per-sample uniform factors and per-sample op ORDER (a length-4
    permutation applied as 4 `lax.switch` steps — under vmap each step
    evaluates the 4 candidate ops and selects, 16 cheap elementwise passes
    total, negligible next to the R(2+1)D stack).  Zero-strength ops draw
    identity factors, keeping the compiled structure static.
    """
    import jax
    import jax.numpy as jnp

    n = frames.shape[0]
    kb, kc, ks, kh, kp = jax.random.split(key, 5)
    u = lambda k, lo, hi: jax.random.uniform(k, (n,), minval=lo, maxval=hi)
    fb = u(kb, max(0.0, 1 - brightness), 1 + brightness) if brightness > 0 \
        else jnp.ones((n,))
    fc = u(kc, max(0.0, 1 - contrast), 1 + contrast) if contrast > 0 \
        else jnp.ones((n,))
    fs = u(ks, max(0.0, 1 - saturation), 1 + saturation) if saturation > 0 \
        else jnp.ones((n,))
    fh = u(kh, -hue, hue) if hue > 0 else jnp.zeros((n,))
    perms = jax.vmap(lambda k: jax.random.permutation(k, 4))(
        jax.random.split(kp, n))

    def one(x, fb, fc, fs, fh, perm):
        branches = [
            lambda x: _jadjust_brightness(x, fb),
            lambda x: _jadjust_contrast(x, fc),
            lambda x: _jadjust_saturation(x, fs),
            lambda x: _jadjust_hue(x, fh),
        ]
        for step in range(4):
            x = jax.lax.switch(perm[step], branches, x)
        return x

    return jax.vmap(one)(frames, fb, fc, fs, fh, perms)
