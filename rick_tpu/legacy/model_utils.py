"""Model bookkeeping helpers (`gan_training/utils.py`,
`gan_training/utils_model_load.py`)."""

from __future__ import annotations

import jax
import numpy as np

from rick_tpu.utils.images import save_image_grid


def get_parameter_number(params, name: str = "model"):
    """Total parameter count (`utils_model_load.py:10-14`); in the functional
    setting every leaf is 'trainable' -- masking decides what actually trains."""
    total = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    return {"name": name, "Total": total, "Trainable": total}


def save_feature_map(feats, outfile: str, nrow: int = 8):
    """Per-channel min-max normalized feature map grid
    (`gan_training/utils.py:12-21`).  feats: (N, C, H, W) -> grid of N*C maps."""
    arr = np.asarray(feats, np.float32)
    n, c, h, w = arr.shape
    flat = arr.reshape(n * c, -1)
    vmin = flat.min(axis=1, keepdims=True)
    vmax = flat.max(axis=1, keepdims=True)
    norm = (flat - vmin) / np.maximum(vmax - vmin, 1e-12)
    maps = norm.reshape(n * c, 1, h, w)
    # replicate to 3 channels, already in [0,1]: map into [-1,1] for the saver
    rgb = np.repeat(maps, 3, axis=1) * 2.0 - 1.0
    save_image_grid(rgb, outfile, nrow=nrow)


def update_average(params_tgt, params_src, beta: float):
    """EMA update (`gan_training/utils.py:52-58`) as a pure function."""
    return jax.tree.map(lambda t, s: beta * t + (1.0 - beta) * s, params_tgt, params_src)
