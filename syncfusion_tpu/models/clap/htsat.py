"""HTSAT-tiny audio encoder (Swin transformer over mel "images").

The LAION-CLAP audio tower (amodel='HTSAT-tiny'): 48 kHz audio → 64-bin mel
spectrogram (n_fft 1024, hop 480, 50–14000 Hz, power→dB) → reshaped into a
256×256 single-channel image (time split into freq_ratio=4 vertical bands)
→ 4×4 patch embed (dim 96) → 4 Swin stages depths (2,2,6,2), heads
(4,8,16,32), window 8 → LayerNorm → global average pool → 768-d latent.

Input contract matches the reference exactly: 10 s at 48 kHz (480000
samples); shorter audio is repeat-padded, longer is truncated — the
"repeatpad"/"rand_trunc" policy of laion_clap used by
``get_audio_embedding_from_data`` (reference call site:
main/module_diffusion.py:64-67).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from syncfusion_tpu.models.clap.swin import SwinStage
from syncfusion_tpu.ops.mel import mel_filterbank
from syncfusion_tpu.ops.stft import spectrogram

CLAP_SR = 48000
CLAP_SAMPLES = 10 * CLAP_SR  # 480000
N_FFT = 1024
HOP = 480
N_MELS = 64
FMIN, FMAX = 50.0, 14000.0
SPEC_SIZE = 256
FREQ_RATIO = SPEC_SIZE // N_MELS  # 4
TARGET_T = SPEC_SIZE * FREQ_RATIO  # 1024 frames


def clap_mel(wav: jax.Array) -> jax.Array:
    """(B, 480000) audio → (B, frames, 64) power-dB mel (torchaudio
    MelSpectrogram(power=2) + AmplitudeToDB semantics)."""
    spec = spectrogram(wav, n_fft=N_FFT, hop_length=HOP, power=2.0)
    fb = jnp.asarray(
        mel_filterbank(CLAP_SR, N_FFT, N_MELS, FMIN, FMAX, scale="htk", norm=None)
    )
    mel = jnp.einsum("mf,bft->bmt", fb, spec)
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    return jnp.transpose(db, (0, 2, 1))  # (B, T, mels)


def reshape_mel_to_image(mel: jax.Array) -> jax.Array:
    """(B, T, 64) → (B, 256, 256, 1): crop/pad T to 1024, stack
    freq_ratio=4 time quarters vertically (HTSAT reshape_wav2img)."""
    b, t, f = mel.shape
    if t < TARGET_T:
        mel = jnp.pad(mel, ((0, 0), (0, TARGET_T - t), (0, 0)))
    else:
        mel = mel[:, :TARGET_T]
    x = jnp.transpose(mel, (0, 2, 1))  # (B, F, T)
    x = x.reshape(b, f, FREQ_RATIO, TARGET_T // FREQ_RATIO)
    x = jnp.transpose(x, (0, 2, 1, 3))  # (B, ratio, F, T/ratio)
    x = x.reshape(b, FREQ_RATIO * f, TARGET_T // FREQ_RATIO)
    return x[..., None]  # (B, 256, 256, 1)


class HTSAT(nn.Module):
    embed_dim: int = 96
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (4, 8, 16, 32)
    window_size: int = 8
    patch_size: int = 4

    @nn.compact
    def __call__(self, image: jax.Array) -> jax.Array:
        """(B, 256, 256, 1) mel image → (B, 768) latent."""
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), name="patch_embed",
        )(image)
        b, h, w, c = x.shape
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x.reshape(b, h * w, c))

        res = SPEC_SIZE // self.patch_size  # 64
        dim = self.embed_dim
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            x = SwinStage(
                dim=dim,
                input_resolution=res,
                depth=depth,
                num_heads=heads,
                window_size=self.window_size,
                downsample=i < len(self.depths) - 1,
                name=f"layers_{i}",
            )(x)
            if i < len(self.depths) - 1:
                res //= 2
                dim *= 2

        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return jnp.mean(x, axis=1)  # global average pool → (B, 768)


def prepare_audio(wav: np.ndarray | jax.Array, length: int = CLAP_SAMPLES):
    """Repeat-pad / truncate to 10 s (laion_clap 'repeatpad' + truncation)."""
    xp = jnp if isinstance(wav, jnp.ndarray) else np
    t = wav.shape[-1]
    if t < length:
        reps = int(np.ceil(length / t))
        wav = xp.tile(wav, (1,) * (wav.ndim - 1) + (reps,))
    return wav[..., :length]
