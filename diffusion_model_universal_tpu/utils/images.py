"""Image grid / saving utilities.

Replaces the reference's torchvision ``make_grid`` / ``save_image`` usage
(`trainers/ddpm_trainer.py:792-848`, `scripts/generate.py:118-133`):
normalize from the model's [-1, 1] value range, tile into a grid, write PNG
(PIL) with an .npy fallback.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Optional, Sequence

import numpy as np


def to_uint8(images: np.ndarray, value_range=(-1.0, 1.0)) -> np.ndarray:
    """Map NHWC floats in ``value_range`` to uint8 (the reference saves with
    ``normalize=True, value_range=(-1, 1)``, `generate.py:122-133`)."""
    lo, hi = value_range
    x = (np.asarray(images, np.float32) - lo) / max(hi - lo, 1e-8)
    return (np.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: int = 0) -> np.ndarray:
    """Tile [N, H, W, C] uint8 images into a single [GH, GW, C] grid
    (torchvision ``make_grid`` semantics: ``nrow`` images per row)."""
    n, h, w, c = images.shape
    ncol = nrow
    nrows = math.ceil(n / ncol)
    grid = np.full((nrows * (h + padding) + padding,
                    ncol * (w + padding) + padding, c), pad_value, np.uint8)
    for i in range(n):
        r, col = divmod(i, ncol)
        top = r * (h + padding) + padding
        left = col * (w + padding) + padding
        grid[top:top + h, left:left + w] = images[i]
    return grid


def save_image(images: np.ndarray, path: str, nrow: Optional[int] = None,
               value_range=(-1.0, 1.0)) -> str:
    """Save a batch (gridded) or single image as PNG; .npy fallback."""
    arr = to_uint8(images, value_range)
    if arr.ndim == 4:
        arr = make_grid(arr, nrow or int(math.ceil(math.sqrt(len(arr)))))
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    try:
        from PIL import Image
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
        Image.fromarray(arr).save(str(p))
        return str(p)
    except ImportError:  # pragma: no cover
        alt = p.with_suffix(".npy")
        np.save(str(alt), arr)
        return str(alt)


def to_grid_png_bytes(images: np.ndarray, nrow: Optional[int] = None,
                      value_range=(-1.0, 1.0)) -> bytes:
    """Encode a batch as one PNG grid, in memory (the serving path —
    `scripts/serve.py` returns this as the HTTP response body)."""
    arr = to_uint8(images, value_range)
    if arr.ndim == 4:
        arr = make_grid(arr, nrow or int(math.ceil(math.sqrt(len(arr)))))
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def frames_to_grid(frames: Sequence[np.ndarray], value_range=(-1.0, 1.0)
                   ) -> np.ndarray:
    """Lay out sampler intermediates as rows: one row per sample, one column
    per saved frame (the reference grids intermediates with
    ``nrow=len(intermediates)``, `trainers/ddim_trainer.py:61-76`)."""
    stacked = np.stack([np.asarray(f) for f in frames], axis=1)
    n, s, h, w, c = stacked.shape
    flat = to_uint8(stacked.reshape(n * s, h, w, c), value_range)
    return make_grid(flat, nrow=s)
