"""Polyphase windowed-sinc resampling.

Reproduces the semantics of the resampler the reference relies on throughout
(torchaudio ``functional.resample`` defaults: hann-windowed sinc lowpass,
``lowpass_filter_width=6``, ``rolloff=0.99`` — reference usage:
main/dataset_diffusion.py:15-16, main/generation.py:91-97).  This is the
standard polyphase algorithm: one FIR kernel per output phase, applied as a
strided convolution.

Two implementations share the kernel builder:
  * ``resample``      — numpy, for the host-side data pipeline.
  * ``resample_jax``  — ``lax.conv_general_dilated``, jittable, batched, for
    on-device use (e.g. 48 kHz → 22.05 kHz after generation).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple[np.ndarray, int, int, int]:
    """Build the polyphase kernel bank.

    Returns ``(kernels (new, K), width, orig, new)`` with frequencies reduced
    by their gcd.
    """
    g = math.gcd(int(orig_freq), int(new_freq))
    orig, new = orig_freq // g, new_freq // g
    assert lowpass_filter_width > 0
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)

    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = (-np.arange(new, dtype=np.float64)[:, None] / new + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    kernels = np.sinc(t) * window * (base_freq / orig)
    return kernels.astype(np.float32), width, orig, new


def _out_length(length: int, orig: int, new: int) -> int:
    return int(math.ceil(new * length / orig))


def resample(
    wav: np.ndarray,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> np.ndarray:
    """Resample ``(..., T)`` numpy audio from ``orig_freq`` to ``new_freq``."""
    if orig_freq == new_freq:
        return np.asarray(wav, dtype=np.float32)
    kernels, width, orig, new = _kernel(orig_freq, new_freq, lowpass_filter_width, rolloff)
    x = np.asarray(wav, dtype=np.float32)
    shape, length = x.shape[:-1], x.shape[-1]
    x = x.reshape(-1, length)
    target_len = _out_length(length, orig, new)

    num_frames = length // orig + 1
    padded = np.pad(x, ((0, 0), (width, width + orig)))
    k_size = kernels.shape[1]
    # Frames at stride ``orig``: (B, num_frames, K)
    frames = np.lib.stride_tricks.sliding_window_view(padded, k_size, axis=-1)[
        :, : num_frames * orig : orig, :
    ]
    # (B, num_frames, K) @ (K, new) -> (B, num_frames, new) -> interleave
    y = frames @ kernels.T
    y = y.reshape(x.shape[0], -1)[:, :target_len]
    return y.reshape(*shape, target_len)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def resample_jax(
    wav: jax.Array,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jax.Array:
    """Jittable resample of ``(..., T)`` audio (static in/out lengths)."""
    if orig_freq == new_freq:
        return wav
    kernels, width, orig, new = _kernel(orig_freq, new_freq, lowpass_filter_width, rolloff)
    shape, length = wav.shape[:-1], wav.shape[-1]
    target_len = _out_length(length, orig, new)

    x = wav.reshape(-1, 1, length)
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + orig)))
    k = jnp.asarray(kernels)[:, None, :]  # (new, 1, K) OIK
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(orig,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, new, num_frames)
    y = jnp.transpose(y, (0, 2, 1)).reshape(x.shape[0], -1)[:, :target_len]
    return y.reshape(*shape, target_len)
