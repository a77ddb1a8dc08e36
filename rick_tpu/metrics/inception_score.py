"""KL-based Inception Score, mirror of
`gan_training/metrics/inception_score.py:12-58`: softmax over InceptionV3
logits, per-split KL(p(y|x) || p(y)), exp of the mean, mean/std over splits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rick_tpu.metrics.inception import default_inception_params, inception_logits


def inception_score(imgs, *, batch_size: int = 32, splits: int = 1, resize: bool = False, params=None):
    """imgs: (N, 3, H, W) generator-range images.  Returns (mean, std)."""
    if params is None:
        params = default_inception_params()
    n = imgs.shape[0]
    assert batch_size > 0 and n > batch_size

    fwd = jax.jit(lambda p, x: jax.nn.softmax(inception_logits(p, x, resize_input=resize), axis=-1))
    preds = np.zeros((n, 1000))
    for s in range(0, n, batch_size):
        batch = jnp.asarray(np.asarray(imgs[s : s + batch_size], np.float32))
        preds[s : s + batch.shape[0]] = np.asarray(fwd(params, batch))

    split_scores = []
    for k in range(splits):
        part = preds[k * (n // splits) : (k + 1) * (n // splits)]
        py = np.mean(part, axis=0)
        kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12)[None])
        split_scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
    return float(np.mean(split_scores)), float(np.std(split_scores))
