"""STFT / spectrogram primitives (jittable).

Follows the torch.stft conventions the reference's audio features rely on
(center=True with reflect padding, hann window, one-sided FFT, no
normalization) — reference usages: CondFoleyGen mel extraction
(``Spectrogram(1024, 256, power=1)``, specvqgan/models/vqgan.py:135-138) and
validation spectrogram logging (main/module_diffusion.py:120-133).

Framing is expressed as a gather so the whole pipeline stays inside one XLA
computation; the FFT runs as a batched rfft which XLA maps to the TPU's FFT
path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    # Periodic hann (matches torch.hann_window default).
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def stft(
    x: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Complex STFT of ``(..., T)`` → ``(..., n_fft//2+1, frames)``."""
    win_length = win_length or n_fft
    window = hann_window(win_length)
    if win_length < n_fft:  # center-pad window to n_fft (torch behavior)
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    shape = x.shape[:-1]
    x = x.reshape(-1, x.shape[-1])
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode=pad_mode)

    n_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    )
    frames = x[:, idx] * window  # (B, frames, n_fft)
    spec = jnp.fft.rfft(frames, axis=-1)  # (B, frames, n_fft//2+1)
    spec = jnp.swapaxes(spec, -1, -2)
    return spec.reshape(*shape, n_fft // 2 + 1, n_frames)


def spectrogram(
    x: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    power: float = 1.0,
    center: bool = True,
) -> jax.Array:
    """Magnitude (power=1) / power (power=2) spectrogram."""
    s = jnp.abs(stft(x, n_fft, hop_length, win_length, center))
    if power != 1.0:
        s = s ** power
    return s


def istft(
    spec: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
    length: int | None = None,
) -> jax.Array:
    """Inverse STFT with hann overlap-add (for Griffin-Lim decoding)."""
    window = hann_window(n_fft)
    shape = spec.shape[:-2]
    spec = spec.reshape(-1, spec.shape[-2], spec.shape[-1])
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window  # (B, n_frames, n_fft)

    n_frames = frames.shape[1]
    total = n_fft + hop_length * (n_frames - 1)
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]

    def overlap_add(fr):
        y = jnp.zeros((total,), frames.dtype).at[idx.reshape(-1)].add(fr.reshape(-1))
        return y

    y = jax.vmap(overlap_add)(frames)
    win_sq = jnp.zeros((total,)).at[idx.reshape(-1)].add(
        jnp.broadcast_to(window**2, (n_frames, n_fft)).reshape(-1)
    )
    y = y / jnp.maximum(win_sq, 1e-11)
    y = y[:, n_fft // 2 :]
    if length is not None:
        y = y[:, :length]
    return y.reshape(*shape, y.shape[-1])


def griffin_lim(
    magnitude: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_iter: int = 32,
    length: int | None = None,
    momentum: float = 0.99,
    key: jax.Array | None = None,
) -> jax.Array:
    """Fast Griffin-Lim (momentum-accelerated) phase reconstruction
    (reference fallback vocoder path, CondFoleyGen/sample_visualization.py:178-204)."""
    key = key if key is not None else jax.random.key(0)
    angles = jnp.exp(
        2j * jnp.pi * jax.random.uniform(key, magnitude.shape)
    ).astype(jnp.complex64)

    def body(_, carry):
        angles, prev = carry
        full = magnitude * angles
        inv = istft(full, n_fft, hop_length)
        reb = stft(inv, n_fft, hop_length)[..., : magnitude.shape[-1]]
        accel = reb - (momentum / (1.0 + momentum)) * prev
        angles = accel / jnp.maximum(jnp.abs(accel), 1e-16)
        return angles, reb

    angles, _ = jax.lax.fori_loop(0, n_iter, body, (angles, jnp.zeros_like(angles)))
    return istft(magnitude * angles, n_fft, hop_length, length=length)
