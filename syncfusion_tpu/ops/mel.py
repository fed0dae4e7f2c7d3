"""Mel filterbanks and log-mel scaling chains.

One implementation serves every consumer in the framework: CLAP's HTSAT
front-end (48 kHz, htk scale), the SpecVQGAN mel pipeline (22.05 kHz, slaney
scale, 125-7600 Hz — reference: specvqgan/models/vqgan.py:135-138 and
CondFoleyGen/feature_extraction/extract_mel_spectrogram.py:147-157), VGGish
FAD features, and validation logging.

Includes the CondFoleyGen canonical [0,1] spectrogram scaling chain
``lower_thresh(1e-5) → log10 → ×20 → −20 → +100 → ÷100 → clip`` and its
exact inverse (reference: extract_mel_spectrogram.py:147-169).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from syncfusion_tpu.ops.stft import spectrogram


def _hz_to_mel(f, scale: str):
    f = np.asarray(f, dtype=np.float64)
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        log_branch = min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_branch, mels)


def _mel_to_hz(m, scale: str):
    m = np.asarray(m, dtype=np.float64)
    if scale == "htk":
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=32)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    scale: str = "htk",
    norm: str | None = None,
) -> np.ndarray:
    """Triangular mel filterbank ``(n_mels, n_fft//2+1)``.

    ``scale``: "htk" or "slaney"; ``norm``: None or "slaney" (area norm).
    Matches librosa/torchaudio filterbanks to float32 precision.
    """
    fmax = fmax if fmax is not None else sample_rate / 2
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)

    mel_pts = np.linspace(_hz_to_mel(fmin, scale), _hz_to_mel(fmax, scale), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, scale)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        fb *= enorm[:, None]
    return fb.astype(np.float32)


def mel_spectrogram(
    x: jax.Array,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
    power: float = 1.0,
    scale: str = "htk",
    norm: str | None = None,
) -> jax.Array:
    """Mel spectrogram of ``(..., T)`` → ``(..., n_mels, frames)``."""
    spec = spectrogram(x, n_fft=n_fft, hop_length=hop_length, power=power)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax, scale, norm))
    return jnp.einsum(
        "mf,...ft->...mt", fb, spec, precision=jax.lax.Precision.HIGHEST
    )


# --------------------------------------------------------------------------
# SpecVQGAN canonical scaling chain and inverse
# --------------------------------------------------------------------------

def specvqgan_scale(mel: jax.Array) -> jax.Array:
    """``lower_thresh(1e-5)→log10→×20→−20→+100→÷100→clip[0,1]``."""
    x = jnp.log10(jnp.maximum(mel, 1e-5))
    x = (x * 20.0 - 20.0 + 100.0) / 100.0
    return jnp.clip(x, 0.0, 1.0)


def specvqgan_unscale(x: jax.Array) -> jax.Array:
    """Exact inverse of :func:`specvqgan_scale` (up to the clip)."""
    return jnp.power(10.0, (x * 100.0 + 20.0 - 100.0) / 20.0)


def power_to_db(s: jax.Array, ref: float = 1.0, amin: float = 1e-10, top_db: float = 80.0):
    """librosa-compatible dB conversion (used only for logging panels)."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, s))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


def mel01_to_waveform_gl(
    spec01: jax.Array,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_iter: int = 32,
    key: jax.Array | None = None,
) -> jax.Array:
    """[0,1]-scaled mel panel(s) ``(..., 80, T)`` → waveform via the exact
    inverse scaling chain + mel-filterbank pseudo-inverse + Griffin-Lim
    (the reference's vocoder-free decode, sample_visualization.py:178-204 /
    inv_transforms).  Shared by the generation CLI fallback and the
    training-media wav logging."""
    from syncfusion_tpu.ops.stft import griffin_lim

    mel = specvqgan_unscale(spec01)
    n_mels = mel.shape[-2]
    fb = np.asarray(
        mel_filterbank(sample_rate, n_fft, n_mels, 125, 7600,
                       scale="htk", norm="slaney")
    )
    lin = jnp.einsum("mf,...mt->...ft", jnp.asarray(np.linalg.pinv(fb).T), mel)
    return griffin_lim(jnp.maximum(lin, 0.0), n_fft, hop_length,
                       n_iter=n_iter, key=key)
