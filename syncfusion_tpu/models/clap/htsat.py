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

Every stage of this pipeline is live-verified against transformers' CLAP
port (whose default ClapAudioConfig is htsat-tiny-unfused) in
tests/test_clap_hf_parity.py: slaney mel bank, repeatpad, bicubic frame
interpolation, the Swin trunk, token-mean latent pooling, and the
projection MLP.
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
    """(B, 480000) audio → (B, frames, 64) power-dB mel.

    laion_clap's NON-fusion path (the reference's HTSAT-tiny,
    enable_fusion=False) uses the librosa-style filterbank — slaney scale
    with slaney area-norm — not torchaudio's htk bank (oracle:
    ``transformers.ClapFeatureExtractor.mel_filters_slaney``, used whenever
    ``truncation != "fusion"``; parity pinned in tests/test_clap_hf_parity.py).
    dB conversion is power_to_db: 10·log10(max(x, 1e-10)).
    """
    spec = spectrogram(wav, n_fft=N_FFT, hop_length=HOP, power=2.0)
    fb = jnp.asarray(
        mel_filterbank(CLAP_SR, N_FFT, N_MELS, FMIN, FMAX,
                       scale="slaney", norm="slaney")
    )
    mel = jnp.einsum("mf,bft->bmt", fb, spec)
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    return jnp.transpose(db, (0, 2, 1))  # (B, T, mels)


def _torch_bicubic_matrix(in_len: int, out_len: int, a: float = -0.75) -> np.ndarray:
    """1-D cubic-convolution resampling matrix, torch
    ``interpolate(mode="bicubic", align_corners=True)`` semantics
    (source positions o·(in−1)/(out−1), kernel a=−0.75, clamped borders)."""
    W = np.zeros((out_len, in_len), np.float64)
    for o in range(out_len):
        x = o * (in_len - 1) / (out_len - 1) if out_len > 1 else 0.0
        x0 = int(np.floor(x))
        t = x - x0
        for k in range(-1, 3):
            d = abs(t - k)
            if d <= 1.0:
                w = (a + 2.0) * d**3 - (a + 3.0) * d**2 + 1.0
            elif d < 2.0:
                w = a * d**3 - 5.0 * a * d**2 + 8.0 * a * d - 4.0 * a
            else:
                continue
            W[o, min(max(x0 + k, 0), in_len - 1)] += w
    return W


def reshape_mel_to_image(mel: jax.Array) -> jax.Array:
    """(B, T, 64) → (B, 256, 256, 1): bicubic-resample T to 1024 frames
    (HTSAT reshape_wav2img / HF ClapAudioEncoder.reshape_mel2img:
    ``interpolate(mode="bicubic", align_corners=True)`` — a 10 s clip gives
    1001 frames), then stack freq_ratio=4 time quarters vertically."""
    b, t, f = mel.shape
    if t != TARGET_T:
        W = jnp.asarray(_torch_bicubic_matrix(t, TARGET_T), mel.dtype)
        mel = jnp.einsum("ot,btf->bof", W, mel)
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
    """Repeat-pad / truncate to 10 s — laion_clap 'repeatpad' exactly:
    tile ⌊length/t⌋ times, then ZERO-pad the remainder (not a partial
    repeat; oracle: transformers ClapFeatureExtractor padding='repeatpad').
    Longer audio is truncated (the deterministic variant of rand_trunc)."""
    xp = jnp if isinstance(wav, jnp.ndarray) else np
    t = wav.shape[-1]
    if t < length:
        reps = length // t
        wav = xp.tile(wav, (1,) * (wav.ndim - 1) + (reps,))
        pad = [(0, 0)] * (wav.ndim - 1) + [(0, length - wav.shape[-1])]
        wav = xp.pad(wav, pad)
    return wav[..., :length]
