"""Spectral norm / conditional norm layers (`gan_training/ops.py:6-127`),
as functional transforms over param pytrees."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def spectral_norm_apply(weight: jnp.ndarray, u: jnp.ndarray, *, n_iter: int = 1, eps: float = 1e-12):
    """One (or n) power-iteration step(s) of spectral normalization
    (`ops.py:6-63`): returns (w / sigma, new_u).

    weight: (out, ...) flattened over trailing dims; u: (out,) left singular
    vector estimate carried as state."""
    w = weight.reshape(weight.shape[0], -1)

    def l2n(v):
        return v / (jnp.linalg.norm(v) + eps)

    def body(_, u_):
        v_ = l2n(w.T @ u_)
        return l2n(w @ v_)

    u_new = lax.fori_loop(0, n_iter, body, u)
    v = l2n(w.T @ u_new)
    sigma = u_new @ (w @ v)
    return weight / sigma, jax.lax.stop_gradient(u_new)


def cbatch_norm_apply(x, y_embed_gamma, y_embed_beta, *, eps: float = 1e-5):
    """Conditional batch norm (`ops.py:66-96`): per-class affine over
    batch-normalized activations.  x: (N,C,H,W); gamma/beta: (N,C)."""
    mean = jnp.mean(x, axis=(0, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(0, 2, 3), keepdims=True)
    xn = (x - mean) * lax.rsqrt(var + eps)
    return xn * y_embed_gamma[:, :, None, None] + y_embed_beta[:, :, None, None]


def cinstance_norm_apply(x, y_embed_gamma, y_embed_beta, *, eps: float = 1e-5):
    """Conditional instance norm (`ops.py:99-127`)."""
    mean = jnp.mean(x, axis=(2, 3), keepdims=True)
    var = jnp.var(x, axis=(2, 3), keepdims=True)
    xn = (x - mean) * lax.rsqrt(var + eps)
    return xn * y_embed_gamma[:, :, None, None] + y_embed_beta[:, :, None, None]
