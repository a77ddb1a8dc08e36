"""VGG16 (torchvision layout) in functional JAX -- fc2 feature extractor for
improved precision & recall (`gan_metrics/precision_recall.py:34-52,124-151`).

Parameter dict uses torchvision keys (features.N.weight/bias, classifier.0,
classifier.3) so a real vgg16 .pth loads directly.  Note the reference feeds
[-1,1] images with NEAREST resize to 224 and no ImageNet renormalization
(`precision_recall.py:136-140`, F.interpolate default mode) -- replicated.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# config D conv channels; 'M' = maxpool.  torchvision indices with ReLU
# interleaved: conv indices below.
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]


def _conv_indices():
    idx = 0
    out = []
    in_ch = 3
    for c in _CFG:
        if c == "M":
            idx += 1
            continue
        out.append((idx, in_ch, c))
        in_ch = c
        idx += 2  # conv + relu
    return out


_CONVS = _conv_indices()


def vgg16_init(key=None, seed: int = 1) -> Dict[str, jnp.ndarray]:
    if key is None:
        key = jax.random.key(seed)
    params: Dict[str, jnp.ndarray] = {}
    keys = jax.random.split(key, len(_CONVS) + 2)
    for kk, (idx, i, o) in zip(keys, _CONVS):
        params[f"features.{idx}.weight"] = jax.random.normal(
            kk, (o, i, 3, 3), jnp.float32
        ) * np.sqrt(2.0 / (i * 9))
        params[f"features.{idx}.bias"] = jnp.zeros((o,), jnp.float32)
    params["classifier.0.weight"] = jax.random.normal(keys[-2], (4096, 512 * 7 * 7), jnp.float32) * 0.01
    params["classifier.0.bias"] = jnp.zeros((4096,), jnp.float32)
    params["classifier.3.weight"] = jax.random.normal(keys[-1], (4096, 4096), jnp.float32) * 0.01
    params["classifier.3.bias"] = jnp.zeros((4096,), jnp.float32)
    return params


def load_vgg16_params(path: str) -> Dict[str, jnp.ndarray]:
    from rick_tpu.ckpt import load_torch_file

    sd = load_torch_file(path)
    params = {}
    for idx, _i, _o in _CONVS:
        params[f"features.{idx}.weight"] = jnp.asarray(np.asarray(sd[f"features.{idx}.weight"], np.float32))
        params[f"features.{idx}.bias"] = jnp.asarray(np.asarray(sd[f"features.{idx}.bias"], np.float32))
    for li in (0, 3):
        params[f"classifier.{li}.weight"] = jnp.asarray(np.asarray(sd[f"classifier.{li}.weight"], np.float32))
        params[f"classifier.{li}.bias"] = jnp.asarray(np.asarray(sd[f"classifier.{li}.bias"], np.float32))
    return params


def default_vgg16_params() -> Dict[str, jnp.ndarray]:
    path = os.environ.get("RICK_VGG16_WEIGHTS", "")
    if path and os.path.exists(path):
        return load_vgg16_params(path)
    return vgg16_init()


def vgg16_fc2_features(params, x):
    """fc2 (4096-d) features; x NCHW in the caller's range, resized NEAREST to
    224 like the reference (dropout layers are identity in eval)."""
    if x.shape[2] != 224 or x.shape[3] != 224:
        # torch's legacy asymmetric nearest convention (floor(dst*scale)), NOT
        # jax.image.resize's rounded half-pixel centers
        from rick_tpu.metrics.resize import nearest_resize_torch

        x = nearest_resize_torch(x, 224, 224)
    idx = 0
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
    x = x.reshape(x.shape[0], -1)  # (N, 512*7*7)
    x = x @ params["classifier.0.weight"].astype(x.dtype).T + params["classifier.0.bias"].astype(x.dtype)
    x = jax.nn.relu(x)
    x = x @ params["classifier.3.weight"].astype(x.dtype).T + params["classifier.3.bias"].astype(x.dtype)
    return x
