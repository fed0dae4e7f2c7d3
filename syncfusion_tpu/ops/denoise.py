"""Stationary spectral-gate denoiser (jittable).

Native replacement for the reference's ``noisereduce.reduce_noise(x, sr,
n_fft=1024, hop_length=256)`` call in video preprocessing (reference:
script/gh_preprocess_videos.py:91-98, writing ``.resampled_denoised.wav``).

Algorithm (noisereduce's stationary spectral gate):

1. STFT the signal (same 1024/256 hann framing as the mel chain).
2. Estimate a per-frequency noise floor from the signal's own statistics:
   ``thresh_dB[f] = mean_dB[f] + n_std_thresh * std_dB[f]`` over time.
3. Binary mask = frames whose magnitude exceeds the threshold.
4. Smooth the mask with a separable linear-taper kernel over (freq, time)
   so the gate opens/closes gradually instead of gating bin-by-bin.
5. Attenuate masked-out cells by ``prop_decrease`` and inverse-STFT.

Everything is one XLA computation: the mask smoothing is a depthwise 2-D
convolution, the STFT/iSTFT are the shared ops in :mod:`ops.stft`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .stft import istft, stft


def _taper_kernel(n_grad_freq: int, n_grad_time: int) -> np.ndarray:
    """Separable linear-taper smoothing kernel, normalized to sum 1
    (the smoothing filter noisereduce builds from outer(linspace ramps))."""
    ramp_f = np.concatenate([
        np.linspace(0.0, 1.0, n_grad_freq + 1, endpoint=False)[1:],
        np.linspace(1.0, 0.0, n_grad_freq + 2)[:-1],
    ])
    ramp_t = np.concatenate([
        np.linspace(0.0, 1.0, n_grad_time + 1, endpoint=False)[1:],
        np.linspace(1.0, 0.0, n_grad_time + 2)[:-1],
    ])
    k = np.outer(ramp_f, ramp_t)
    return (k / k.sum()).astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "n_grad_freq", "n_grad_time")
)
def spectral_gate(
    wav: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_std_thresh: float = 1.5,
    prop_decrease: float = 1.0,
    n_grad_freq: int = 4,
    n_grad_time: int = 4,
    noise_clip: jax.Array | None = None,
) -> jax.Array:
    """Denoise ``(C, T)`` float waveform; returns the same shape/length.

    ``noise_clip`` optionally provides a separate noise-only segment for the
    floor statistics; by default the signal itself is used (matching the
    reference call, which passes no ``y_noise``).
    """
    length = wav.shape[-1]
    spec = stft(wav, n_fft, hop_length)  # (C, F, frames) complex
    mag = jnp.abs(spec)
    sig_db = 20.0 * jnp.log10(jnp.maximum(mag, 1e-12))

    ref = sig_db if noise_clip is None else 20.0 * jnp.log10(
        jnp.maximum(jnp.abs(stft(noise_clip, n_fft, hop_length)), 1e-12)
    )
    mean_db = jnp.mean(ref, axis=-1, keepdims=True)
    std_db = jnp.std(ref, axis=-1, keepdims=True)
    thresh_db = mean_db + n_std_thresh * std_db

    mask = (sig_db > thresh_db).astype(jnp.float32)  # 1 = keep

    kernel = jnp.asarray(_taper_kernel(n_grad_freq, n_grad_time))
    mask = jax.lax.conv_general_dilated(
        mask[:, None],  # (C, 1, F, frames)
        kernel[None, None],
        window_strides=(1, 1),
        padding="SAME",
    )[:, 0]
    mask = jnp.clip(mask, 0.0, 1.0)

    gain = mask + (1.0 - mask) * (1.0 - prop_decrease)
    return istft(spec * gain.astype(spec.dtype), n_fft, hop_length, length=length)
