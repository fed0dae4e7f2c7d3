"""Fréchet Audio Distance (VGGish) — TPU-native.

Mirrors the reference's evaluation (main/evaluation.py:7-28, the
``frechet_audio_distance`` package with ``model_name="vggish",
use_pca=False, use_activation=False``): embed every wav in two directories
with VGGish (128-d, final ReLU removed) and compute the Fréchet distance
between the two Gaussian fits.

Two embedding backends:
  * ``VGGishEmbedder`` — the Google VGGish CNN in Flax, bit-compatible input
    features (16 kHz, 25 ms window / 10 ms hop STFT, 64 HTK mel bins
    125–7500 Hz, log(mel + 0.01), 0.96 s patches) + a torchvggish weight
    converter.  Requires the public checkpoint (zero-egress images can't
    fetch it, so tests gate on availability).
  * ``MelStatsEmbedder`` — self-contained log-mel frame statistics; no
    weights needed.  NOT the paper metric; useful as a relative
    fidelity signal in hermetic environments.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg
from flax import linen as nn

from syncfusion_tpu.ops.mel import mel_filterbank
from syncfusion_tpu.ops.resample import resample
from syncfusion_tpu.ops.wav import read_wav

# ---------------------------------------------------------------------------
# Fréchet distance
# ---------------------------------------------------------------------------

def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """FID formula: |mu1-mu2|² + Tr(S1 + S2 − 2·sqrt(S1·S2))."""
    diff = mu1 - mu2
    try:
        covmean = scipy.linalg.sqrtm(sigma1 @ sigma2)
    except Exception:
        covmean = None
    if covmean is None or not np.isfinite(covmean).all():
        # rank-deficient covariances (few samples): standard eps·I offset
        eps = 1e-6 * np.eye(sigma1.shape[0])
        covmean = scipy.linalg.sqrtm((sigma1 + eps) @ (sigma2 + eps))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def gaussian_stats(embeddings: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if embeddings.shape[0] == 0:
        raise ValueError("no embeddings — audio too short or directory empty")
    mu = embeddings.mean(axis=0)
    sigma = np.cov(embeddings, rowvar=False)
    return mu, np.atleast_2d(sigma)


# ---------------------------------------------------------------------------
# VGGish input features (vggish_input semantics)
# ---------------------------------------------------------------------------

VGGISH_SR = 16000
_WIN = 400       # 25 ms
_HOP = 160       # 10 ms
_N_MELS = 64
_PATCH = 96      # 0.96 s of 10 ms frames


def vggish_log_mel(y: np.ndarray, sr: int) -> np.ndarray:
    """(T,) audio → (num_patches, 96, 64) log-mel examples."""
    if sr != VGGISH_SR:
        y = resample(y, sr, VGGISH_SR)
    min_len = _WIN + (_PATCH - 1) * _HOP  # one full 0.96 s patch
    if len(y) < min_len:  # repeat-pad short clips so every file contributes
        reps = int(np.ceil(min_len / max(len(y), 1)))
        y = np.tile(y, reps)[:min_len]
    n_frames = 1 + (len(y) - _WIN) // _HOP
    idx = np.arange(n_frames)[:, None] * _HOP + np.arange(_WIN)[None, :]
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(_WIN) / _WIN)
    spec = np.abs(np.fft.rfft(y[idx] * window, n=512, axis=-1))
    fb = mel_filterbank(VGGISH_SR, 512, _N_MELS, 125.0, 7500.0, scale="htk", norm=None)
    mel = spec @ fb.T
    log_mel = np.log(mel + 0.01)
    n_patches = log_mel.shape[0] // _PATCH
    return (
        log_mel[: n_patches * _PATCH]
        .reshape(n_patches, _PATCH, _N_MELS)
        .astype(np.float32)
    )


# ---------------------------------------------------------------------------
# VGGish network (Flax) + torch weight converter
# ---------------------------------------------------------------------------

class VGGish(nn.Module):
    """Google VGGish; returns the 128-d embedding (no final ReLU —
    ``use_activation=False`` semantics)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, 96, 64, 1)
        for i, chans in enumerate([(64,), (128,), (256, 256), (512, 512)]):
            for j, ch in enumerate(chans):
                x = nn.relu(nn.Conv(ch, (3, 3), name=f"conv{i+1}_{j+1}")(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)  # NHWC flatten = torchvggish ordering
        x = nn.relu(nn.Dense(4096, name="fc1_1")(x))
        x = nn.relu(nn.Dense(4096, name="fc1_2")(x))
        return nn.Dense(128, name="fc2")(x)


def convert_torchvggish(state_dict: dict[str, np.ndarray]) -> dict:
    """torchvggish layout: features.{0,3,6,8,11,13} convs,
    embeddings.{0,2,4} linears."""
    from syncfusion_tpu.core.checkpoint import t_conv2d, t_linear

    conv_map = {
        "conv1_1": "features.0", "conv2_1": "features.3",
        "conv3_1": "features.6", "conv3_2": "features.8",
        "conv4_1": "features.11", "conv4_2": "features.13",
    }
    fc_map = {"fc1_1": "embeddings.0", "fc1_2": "embeddings.2", "fc2": "embeddings.4"}
    params: dict = {}
    for ours, theirs in conv_map.items():
        params[ours] = {
            "kernel": t_conv2d(np.asarray(state_dict[f"{theirs}.weight"])),
            "bias": np.asarray(state_dict[f"{theirs}.bias"]),
        }
    for ours, theirs in fc_map.items():
        params[ours] = {
            "kernel": t_linear(np.asarray(state_dict[f"{theirs}.weight"])),
            "bias": np.asarray(state_dict[f"{theirs}.bias"]),
        }
    return {"params": params}


class VGGishEmbedder:
    def __init__(self, checkpoint_path: Optional[str] = None):
        self.net = VGGish()
        if checkpoint_path:
            from syncfusion_tpu.core.checkpoint import load_torch_state_dict

            self.variables = convert_torchvggish(load_torch_state_dict(checkpoint_path))
        else:
            self.variables = jax.jit(
                lambda: self.net.init(jax.random.key(0), jnp.zeros((1, 96, 64, 1)))
            )()
        self._apply = jax.jit(self.net.apply)

    def embed(self, y: np.ndarray, sr: int) -> np.ndarray:
        patches = vggish_log_mel(y, sr)
        if patches.shape[0] == 0:
            return np.zeros((0, 128), np.float32)
        return np.asarray(self._apply(self.variables, patches[..., None]))


class MelStatsEmbedder:
    """Per-patch [mean, std] of the VGGish log-mel features (128-d).
    Weight-free stand-in; clearly not the paper's FAD."""

    def embed(self, y: np.ndarray, sr: int) -> np.ndarray:
        patches = vggish_log_mel(y, sr)
        if patches.shape[0] == 0:
            return np.zeros((0, 2 * _N_MELS), np.float32)
        return np.concatenate(
            [patches.mean(axis=1), patches.std(axis=1)], axis=-1
        ).astype(np.float32)


# ---------------------------------------------------------------------------
# Directory-level FAD (the reference's evaluate_fad)
# ---------------------------------------------------------------------------

def _embed_dir(embedder, d: str | Path) -> np.ndarray:
    embs = []
    for p in sorted(Path(d).glob("*.wav")):
        wav, sr = read_wav(p)
        embs.append(embedder.embed(wav.mean(axis=0), sr))
    if not embs:
        raise ValueError(f"no wavs in {d}")
    return np.concatenate(embs, axis=0)


def evaluate_fad(
    gen_dir: str | Path,
    gt_dir: str | Path,
    vggish_checkpoint: Optional[str] = None,
) -> dict[str, float]:
    """FAD between generated and GT wav directories
    (reference main/evaluation.py:7-28).  Falls back to the weight-free
    mel-stats backend when no VGGish checkpoint is available."""
    if vggish_checkpoint and Path(vggish_checkpoint).exists():
        embedder = VGGishEmbedder(vggish_checkpoint)
        name = "fad_vggish"
    else:
        embedder = MelStatsEmbedder()
        name = "fad_melstats"
    mu1, s1 = gaussian_stats(_embed_dir(embedder, gen_dir))
    mu2, s2 = gaussian_stats(_embed_dir(embedder, gt_dir))
    return {name: frechet_distance(mu1, s1, mu2, s2)}
