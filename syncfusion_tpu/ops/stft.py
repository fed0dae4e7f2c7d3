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


# ---------------------------------------------------------------------------
# Real-arithmetic (r)FFT as Fourier-basis matmuls.
#
# The TPU plugin backend in this environment has spotty complex64 support
# (complex exp / broadcast hit UNIMPLEMENTED at runtime), so Griffin-Lim is
# built entirely on real (re, im) pairs with explicit cos/sin basis matmuls —
# O(N·bins) per frame instead of O(N log N), but at n_fft=1024 that is a
# (frames, 1024) @ (1024, 513) matmul the MXU eats for free.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _fourier_basis_np(n_fft: int):
    # Cache NUMPY (never jnp: a jnp value cached during a jit trace would
    # leak that trace's tracers into every later call).
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft  # (n_fft, bins)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _fourier_basis(n_fft: int):
    cos, sin = _fourier_basis_np(n_fft)
    return jnp.asarray(cos), jnp.asarray(sin)


def _frame(x, n_fft, hop_length, window):
    n_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    return x[:, idx] * window  # (B, frames, n_fft)


def stft_real(x, n_fft=1024, hop_length=256, center=True, pad_mode="reflect"):
    """Real-pair STFT: ``(..., T)`` → (re, im), each ``(..., bins, frames)``.

    Matches :func:`stft` numerics (rfft sign convention) without touching
    complex dtypes."""
    window = hann_window(n_fft)
    shape = x.shape[:-1]
    x = x.reshape(-1, x.shape[-1])
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode=pad_mode)
    frames = _frame(x, n_fft, hop_length, window)
    cos, sin = _fourier_basis(n_fft)
    re = jnp.swapaxes(frames @ cos, -1, -2)
    im = jnp.swapaxes(-(frames @ sin), -1, -2)
    bins = n_fft // 2 + 1
    return (re.reshape(*shape, bins, -1), im.reshape(*shape, bins, -1))


def istft_real(re, im, n_fft=1024, hop_length=256, length=None):
    """Real-pair inverse STFT with hann overlap-add (matches :func:`istft`)."""
    cos, sin = _fourier_basis(n_fft)
    window = hann_window(n_fft)
    shape = re.shape[:-2]
    bins = n_fft // 2 + 1
    re = re.reshape(-1, bins, re.shape[-1])
    im = im.reshape(-1, bins, im.shape[-1])
    w = np.full((bins,), 2.0, np.float32)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    wj = jnp.asarray(w)[:, None]
    # x_n = (1/N) Σ_k w_k (Re_k cos(2πkn/N) − Im_k sin(2πkn/N))
    frames = (
        jnp.swapaxes(re * wj, -1, -2) @ cos.T
        - jnp.swapaxes(im * wj, -1, -2) @ sin.T
    ) / n_fft  # (B, n_frames, n_fft)
    frames = frames * window

    n_frames = frames.shape[1]
    total = n_fft + hop_length * (n_frames - 1)
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]

    y = jax.vmap(
        lambda fr: jnp.zeros((total,), frames.dtype)
        .at[idx.reshape(-1)]
        .add(fr.reshape(-1))
    )(frames)
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
    (reference fallback vocoder path, CondFoleyGen/sample_visualization.py:178-204).

    Implemented on real (re, im) pairs — see the Fourier-basis note above."""
    key = key if key is not None else jax.random.key(0)
    theta = 2.0 * jnp.pi * jax.random.uniform(key, magnitude.shape)
    ang = (jnp.cos(theta), jnp.sin(theta))
    c = momentum / (1.0 + momentum)
    n_frames = magnitude.shape[-1]

    def body(_, carry):
        (ang_re, ang_im), (prev_re, prev_im) = carry
        inv = istft_real(magnitude * ang_re, magnitude * ang_im, n_fft, hop_length)
        reb_re, reb_im = stft_real(inv, n_fft, hop_length)
        reb_re, reb_im = reb_re[..., :n_frames], reb_im[..., :n_frames]
        acc_re = reb_re - c * prev_re
        acc_im = reb_im - c * prev_im
        norm = jnp.maximum(jnp.sqrt(acc_re**2 + acc_im**2), 1e-16)
        return (acc_re / norm, acc_im / norm), (reb_re, reb_im)

    zeros = jnp.zeros_like(magnitude)
    (ang_re, ang_im), _ = jax.lax.fori_loop(
        0, n_iter, body, (ang, (zeros, zeros))
    )
    return istft_real(
        magnitude * ang_re, magnitude * ang_im, n_fft, hop_length, length=length
    )
