"""FID: on-device InceptionV3 pool3 activations + host Frechet distance.

Mirror of `gan_training/metrics/fid_score.py`: activations in fixed batches
(dataset truncated to batch multiples, `:208-211`), statistics in float64,
`scipy.linalg.sqrtm` with the singular-product fallback (`:94-129`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from rick_tpu.metrics.inception import default_inception_params, inception_pool3

_model_params = None  # module-level singleton, like the reference (`fid_score.py:39`)


def _params():
    global _model_params
    if _model_params is None:
        _model_params = default_inception_params()
    return _model_params


@functools.partial(jax.jit, static_argnames=("nhwc",))
def _pool3(params, batch, nhwc=False):
    return inception_pool3(params, batch, nhwc=nhwc)


@functools.partial(jax.jit, static_argnames=("nhwc",))
def _pool3_u8(params, batch_u8, nhwc=False):
    # uint8 H2D + on-device dequant: the pipeline's [-1,1] f32 images came
    # from uint8 pixels, so uploading the uint8 and dividing on device is
    # EXACT and moves 4x fewer bytes over the (slow) host<->device link
    x = batch_u8.astype(jnp.float32) / 127.5 - 1.0
    return inception_pool3(params, x, nhwc=nhwc)


def get_activations(
    images: np.ndarray, batch_size: int = 64, params=None, *, nhwc: bool = False
) -> np.ndarray:
    """pool3 activations for NCHW images in [-1, 1] (numpy or jax array).

    uint8 input is accepted as raw pixels (dequantized to [-1,1] ON DEVICE --
    4x less host->device traffic).  nhwc=True requires params pre-transposed
    with inception.params_to_nhwc."""
    if params is None:
        params = _params()
    d0 = images.shape[0]
    batch_size = min(batch_size, d0)
    n_batches = d0 // batch_size
    u8 = np.asarray(images).dtype == np.uint8
    outs = []
    for i in range(n_batches):
        chunk = np.asarray(images[i * batch_size : (i + 1) * batch_size])
        if u8:
            acts = _pool3_u8(params, jnp.asarray(chunk), nhwc=nhwc)
        else:
            acts = _pool3(params, jnp.asarray(chunk.astype(np.float32)), nhwc=nhwc)
        outs.append(np.asarray(acts, np.float64))
    return np.concatenate(outs, axis=0)


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6) -> float:
    """`fid_score.py:94-129` verbatim math."""
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"Imaginary component {np.max(np.abs(covmean.imag))}"
            )
        covmean = covmean.real

    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


@jax.jit
def _frechet_device(mu1, sigma1, mu2, sigma2):
    """Frechet distance fully on device.

    tr sqrtm(S1 S2) is computed via the symmetric reformulation
    tr sqrt(A S2 A) with A = sqrtm(S1): two eigendecompositions of symmetric
    PSD matrices (stable in f32 after clipping), avoiding the host Schur-based
    scipy.linalg.sqrtm, which takes minutes for 2048x2048 on a small host."""
    diff = mu1 - mu2
    w1, v1 = jnp.linalg.eigh(sigma1)
    a = (v1 * jnp.sqrt(jnp.clip(w1, 0.0, None))) @ v1.T  # sqrtm(S1)
    m = a @ sigma2 @ a
    w2 = jnp.linalg.eigvalsh((m + m.T) / 2.0)
    tr_covmean = jnp.sum(jnp.sqrt(jnp.clip(w2, 0.0, None)))
    return diff @ diff + jnp.trace(sigma1) + jnp.trace(sigma2) - 2.0 * tr_covmean


def calculate_frechet_distance_device(mu1, sigma1, mu2, sigma2) -> float:
    return float(
        _frechet_device(
            jnp.asarray(mu1, jnp.float32),
            jnp.asarray(sigma1, jnp.float32),
            jnp.asarray(mu2, jnp.float32),
            jnp.asarray(sigma2, jnp.float32),
        )
    )


def activation_statistics(images, batch_size=64, params=None):
    act = get_activations(images, batch_size, params)
    mu = np.mean(act, axis=0)
    sigma = np.cov(act, rowvar=False)
    return mu, sigma


def calculate_fid_given_images(imgs0, imgs1, batch_size: int = 64, params=None) -> float:
    """FID between two image sets, with the reference's batch-truncation
    semantics (`fid_score.py:198-217`).  The trace-of-sqrtm runs on device
    unless RICK_FID_HOST_SQRTM=1 selects the reference's scipy path."""
    import os

    b0 = min(batch_size, imgs0.shape[0])
    b1 = min(batch_size, imgs1.shape[0])
    imgs0 = imgs0[: (imgs0.shape[0] // b0) * b0]
    imgs1 = imgs1[: (imgs1.shape[0] // b1) * b1]
    m1, s1 = activation_statistics(imgs0, b0, params)
    m2, s2 = activation_statistics(imgs1, b1, params)
    if os.environ.get("RICK_FID_HOST_SQRTM"):
        return calculate_frechet_distance(m1, s1, m2, s2)
    return calculate_frechet_distance_device(m1, s1, m2, s2)
