"""LPIPS perceptual distance (VGG backbone), used by the reference's
intra-cluster LPIPS diversity metric (`gan_training/eval.py:83-220`, via the
`lpips` pip package with net='vgg').

Architecture (Zhang et al. 2018): inputs scaled by the LPIPS normalization
layer, VGG16 features at relu{1_2,2_2,3_3,4_3,5_3}, channel-unit-normalized,
squared differences weighted by learned non-negative 1x1 'lin' layers, spatial
mean, summed over layers.  Weights: set RICK_LPIPS_WEIGHTS to the lpips vgg
.pth (keys lin0.model.1.weight ...); without it, uniform 1/C weights give a
valid (unlearned) perceptual distance -- documented fallback.
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rick_tpu.metrics.vgg import _CFG, default_vgg16_params

# conv indices in torchvision features at which LPIPS taps activations.
# lpips slices features at [0:4],[4:9],[9:16],[16:23],[23:30] -> activations
# after relu1_2 (conv #2), relu2_2 (#4), relu3_3 (#7), relu4_3 (#10),
# relu5_3 (#13) in a 1-based conv counter within config D.  (A {2,4,7,9,12}
# mis-tap -- relu4_2/relu5_2 -- was caught by the torch-oracle parity test.)
_TAP_AFTER_CONV = {2, 4, 7, 10, 13}
_TAP_CHANNELS = [64, 128, 256, 512, 512]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_lpips_lin_weights(path: str) -> List[jnp.ndarray]:
    from rick_tpu.ckpt import load_torch_file

    sd = load_torch_file(path)
    lins = []
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in sd:
                lins.append(jnp.asarray(np.asarray(sd[key], np.float32)).reshape(-1))
                break
        else:
            raise KeyError(f"lin{i} weights not found in {path}")
    return lins


def default_lin_weights() -> List[jnp.ndarray]:
    path = os.environ.get("RICK_LPIPS_WEIGHTS", "")
    if path and os.path.exists(path):
        return load_lpips_lin_weights(path)
    return [jnp.full((c,), 1.0 / c, jnp.float32) for c in _TAP_CHANNELS]


def _vgg_taps(params, x):
    """VGG16 conv features at the LPIPS tap points; x in [-1, 1]."""
    x = (x - jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)) / jnp.asarray(_SCALE).reshape(1, 3, 1, 1)
    taps = []
    idx = 0
    conv_i = 0
    for c in _CFG:
        if c == "M":
            x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
            idx += 1
            continue
        w = params[f"features.{idx}.weight"].astype(x.dtype)
        b = params[f"features.{idx}.bias"].astype(x.dtype)
        x = lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW")
        ) + b.reshape(1, -1, 1, 1)
        x = jax.nn.relu(x)
        idx += 2
        conv_i += 1
        if conv_i in _TAP_AFTER_CONV:
            taps.append(x)
    return taps


def lpips_distance(x0, x1, *, vgg_params=None, lin_weights=None):
    """LPIPS(x0, x1) per pair; inputs (N, 3, H, W) in [-1, 1]."""
    if vgg_params is None:
        vgg_params = default_vgg16_params()
    if lin_weights is None:
        lin_weights = default_lin_weights()
    t0 = _vgg_taps(vgg_params, x0)
    t1 = _vgg_taps(vgg_params, x1)
    total = 0.0
    for f0, f1, w in zip(t0, t1, lin_weights):
        # lpips.normalize_tensor adds eps to the NORM (f / (||f|| + eps)),
        # not under the sqrt -- matched exactly for oracle parity
        n0 = f0 / (jnp.sqrt(jnp.sum(f0**2, axis=1, keepdims=True)) + 1e-10)
        n1 = f1 / (jnp.sqrt(jnp.sum(f1**2, axis=1, keepdims=True)) + 1e-10)
        d = (n0 - n1) ** 2
        total = total + jnp.mean(jnp.sum(d * w.reshape(1, -1, 1, 1), axis=1), axis=(1, 2))
    return total
