"""LeNet5 feature extractor -- the reference's alternative FID feature space
(`gan_metrics/fid_score.py:255-263`, model `gan_metrics/models/lenet.py`).

Loads the shipped `lenet.pth` (legacy torch serialization) via
ckpt.load_torch_file.  Input: grayscale 32x32 in the caller's range; features
= 84-d f6 activations (tanh), mirror of `LeNet5.extract_features`.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def load_lenet_params(path: str) -> Dict[str, jnp.ndarray]:
    from rick_tpu.ckpt import load_torch_file

    sd = load_torch_file(path)
    return {k: jnp.asarray(np.asarray(v, np.float32)) for k, v in sd.items()}


def _maxpool2_p1(x):
    # MaxPool2d(kernel=2, stride=2, padding=1)
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), [(0, 0), (0, 0), (1, 1), (1, 1)]
    )


def lenet_features(params, x):
    """84-d tanh features of LeNet5 (`lenet.py:46-50`); x (N,1,32,32)."""

    def conv(x, w, b):
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
        ) + b.astype(x.dtype).reshape(1, -1, 1, 1)

    x = jnp.tanh(conv(x, params["convnet.c1.weight"], params["convnet.c1.bias"]))
    x = _maxpool2_p1(x)
    x = jnp.tanh(conv(x, params["convnet.c3.weight"], params["convnet.c3.bias"]))
    x = _maxpool2_p1(x)
    x = jnp.tanh(conv(x, params["convnet.c5.weight"], params["convnet.c5.bias"]))
    x = x.reshape(x.shape[0], -1)
    x = x @ params["fc.f6.weight"].astype(x.dtype).T + params["fc.f6.bias"].astype(x.dtype)
    return jnp.tanh(x)
