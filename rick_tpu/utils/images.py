"""Image grid saving, mirror of `gan_training/utils.py:7-9` +
torchvision.utils.save_image semantics (unnormalize from [-1,1], grid with
2px padding)."""

from __future__ import annotations

import numpy as np
from PIL import Image


def save_image_grid(imgs, path: str, nrow: int = 8, padding: int = 2):
    """imgs: (N, 3, H, W) in [-1, 1] (numpy or jax array)."""
    arr = np.asarray(imgs, np.float32)
    arr = np.clip(arr / 2 + 0.5, 0.0, 1.0)
    n, c, h, w = arr.shape
    ncol = nrow
    nrow_eff = (n + ncol - 1) // ncol
    grid = np.zeros(
        (c, nrow_eff * (h + padding) + padding, ncol * (w + padding) + padding),
        np.float32,
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[:, y : y + h, x : x + w] = arr[i]
    out = (grid.transpose(1, 2, 0) * 255).round().astype(np.uint8)
    Image.fromarray(out).save(path)
