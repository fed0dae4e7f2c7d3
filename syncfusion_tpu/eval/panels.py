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
