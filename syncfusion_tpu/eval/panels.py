"""Spectrogram panel writer — the ImageLogger equivalent.

The reference logs input/reconstruction/sample spectrogram grids as PNGs
plus vocoded wavs during VQGAN/transformer training
(CondFoleyGen/specvqgan/modules/callbacks/image_logger.py:16-230).  Here:
PIL-rendered viridis panels written to the run dir (and mirrored by
MetricLogger's wandb hook when enabled).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

# compact viridis approximation (anchor colors, linearly interpolated)
_VIRIDIS = np.array(
    [[68, 1, 84], [59, 82, 139], [33, 145, 140], [94, 201, 98], [253, 231, 37]],
    np.float32,
)


def _colormap(x: np.ndarray) -> np.ndarray:
    """x in [0,1] → (… ,3) uint8 viridis-ish."""
    x = np.clip(x, 0.0, 1.0) * (len(_VIRIDIS) - 1)
    i = np.clip(x.astype(int), 0, len(_VIRIDIS) - 2)
    frac = (x - i)[..., None]
    rgb = _VIRIDIS[i] * (1 - frac) + _VIRIDIS[i + 1] * frac
    return rgb.astype(np.uint8)


def spec_to_image(spec: np.ndarray, upscale: int = 3) -> Image.Image:
    """(H, W) spectrogram (any range) → PIL image (low freqs at bottom)."""
    s = np.asarray(spec, np.float32)
    rng = s.max() - s.min()
    s = (s - s.min()) / rng if rng > 0 else np.zeros_like(s)
    img = Image.fromarray(_colormap(s[::-1]))
    return img.resize((img.width * upscale, img.height * upscale), Image.NEAREST)


def write_spec_panel(
    out_dir: str | Path,
    name: str,
    specs: dict[str, np.ndarray],
    step: int = 0,
) -> Path:
    """Write a labeled row-per-entry panel, e.g.
    {"inputs": x, "reconstructions": xrec, "samples": s}."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rows = [spec_to_image(s) for s in specs.values()]
    width = max(r.width for r in rows)
    height = sum(r.height for r in rows)
    panel = Image.new("RGB", (width, height))
    y = 0
    for r in rows:
        panel.paste(r, (0, y))
        y += r.height
    path = out_dir / f"{name}_step{step:08d}.png"
    panel.save(path)
    return path


def write_label_plot(
    out_dir: str | Path,
    name: str,
    target: np.ndarray,
    pred_prob: np.ndarray,
    step: int = 0,
    px_per_frame: int = 12,
    height: int = 160,
) -> Path:
    """Per-frame onset label line plot: target (step trace, dark) vs
    predicted probability (light trace) — the disk-artifact equivalent of
    the reference's wandb line plots (main/module_onset.py:231-261)."""
    from PIL import ImageDraw

    target = np.asarray(target, np.float32).ravel()
    pred_prob = np.asarray(pred_prob, np.float32).ravel()
    t = len(target)
    img = Image.new("RGB", (max(t, 2) * px_per_frame, height), (255, 255, 255))
    draw = ImageDraw.Draw(img)

    def y(v):  # value in [0,1] → pixel row (margin 10)
        return int((height - 10) - float(np.clip(v, 0, 1)) * (height - 20))

    draw.line([(0, y(0.5)), (img.width, y(0.5))], fill=(230, 230, 230))
    for series, color in ((target, (30, 60, 200)), (pred_prob, (220, 80, 40))):
        pts = [(i * px_per_frame + px_per_frame // 2, y(v))
               for i, v in enumerate(series)]
        if len(pts) > 1:
            draw.line(pts, fill=color, width=2)
        for p in pts:
            draw.ellipse([p[0] - 2, p[1] - 2, p[0] + 2, p[1] + 2], fill=color)

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"{name}_step{step:08d}.png"
    img.save(path)
    return path


def visualize_attention(att: np.ndarray, scale_by_prior: bool = True) -> np.ndarray:
    """(B, H, T, T) attention probs → (B, T, T) aggregated maps (reference
    image_logger.py:51-61): optionally subtract the causal uniform prior
    1/(row+1) per row, then sum over heads."""
    att = np.asarray(att, np.float32)
    b, h, t, _ = att.shape
    if scale_by_prior:
        prior = np.tril(1.0 / np.arange(1, t + 1, dtype=np.float32)[:, None]
                        * np.ones((t, t), np.float32))
        att = att - prior[None, None]
    return att.sum(axis=1)


def write_attention_panel(
    out_dir: str | Path,
    name: str,
    att: np.ndarray,
    step: int = 0,
    scale_by_prior: bool = True,
    max_maps: int = 4,
) -> Path:
    """Write a grid of per-item aggregated attention maps (the reference's
    ``att_half/att_nopix/att_det`` grids, image_logger.py:99-101)."""
    maps = visualize_attention(att, scale_by_prior)[:max_maps]
    # normalize=True semantics of make_grid: min/max over the whole grid
    lo, hi = maps.min(), maps.max()
    maps = (maps - lo) / (hi - lo) if hi > lo else np.zeros_like(maps)

    tiles = [Image.fromarray(_colormap(m)) for m in maps]
    upscale = max(1, 256 // tiles[0].width)
    tiles = [t.resize((t.width * upscale, t.height * upscale), Image.NEAREST)
             for t in tiles]
    pad = 2
    width = sum(t.width for t in tiles) + pad * (len(tiles) - 1)
    panel = Image.new("RGB", (width, tiles[0].height))
    x = 0
    for t in tiles:
        panel.paste(t, (x, 0))
        x += t.width + pad
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"{name}_step{step:08d}.png"
    panel.save(path)
    return path


def write_media_wavs(
    out_dir: str | Path,
    name: str,
    specs01: dict[str, np.ndarray],
    step: int = 0,
    sample_rate: int = 22050,
    n_iter: int = 16,
    max_items: int = 2,
) -> list[Path]:
    """Vocode [0,1] mel panels ``(B, 80, T)`` via Griffin-Lim and write wavs
    (the reference ImageLogger's ``_log_rec_audio``, image_logger.py:63-80 —
    MelGAN there; the GL inverse chain here, weights-free)."""
    import jax.numpy as jnp

    from syncfusion_tpu.ops.mel import mel01_to_waveform_gl
    from syncfusion_tpu.ops.wav import write_wav

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for key, spec in specs01.items():
        spec = np.asarray(spec, np.float32)[:max_items]
        wavs = np.asarray(
            mel01_to_waveform_gl(jnp.asarray(spec), sample_rate, n_iter=n_iter)
        )
        for i in range(wavs.shape[0]):
            p = out_dir / f"{name}_{key}_{i}_step{step:08d}.wav"
            write_wav(p, wavs[i], sample_rate)
            paths.append(p)
    return paths
