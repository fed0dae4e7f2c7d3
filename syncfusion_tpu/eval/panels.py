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
