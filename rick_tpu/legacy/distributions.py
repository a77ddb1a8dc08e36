"""Latent distributions + spherical interpolation
(`gan_training/distributions.py:5-43`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_zdist(dist_name: str, dim: int):
    """Returns a sampler fn(key, n) -> (n, dim); 'gauss' or 'uniform'
    (mirror of `distributions.py:5-20`)."""
    if dist_name == "gauss":
        def sample(key, n):
            return jax.random.normal(key, (n, dim))
    elif dist_name == "uniform":
        def sample(key, n):
            return jax.random.uniform(key, (n, dim), minval=-1.0, maxval=1.0)
    else:
        raise NotImplementedError(dist_name)
    sample.dim = dim
    return sample


def get_ydist(nlabels: int):
    """Uniform categorical label sampler (`distributions.py:23-30`)."""
    def sample(key, n):
        return jax.random.randint(key, (n,), 0, nlabels)
    sample.nlabels = nlabels
    return sample


def interpolate_sphere(z1, z2, t):
    """slerp (`distributions.py:33-43`)."""
    p = jnp.sum(z1 * z2, axis=-1, keepdims=True)
    p = p / (jnp.linalg.norm(z1, axis=-1, keepdims=True) * jnp.linalg.norm(z2, axis=-1, keepdims=True))
    omega = jnp.arccos(jnp.clip(p, -1.0, 1.0))
    s1 = jnp.sin((1 - t) * omega) / jnp.sin(omega)
    s2 = jnp.sin(t * omega) / jnp.sin(omega)
    return s1 * z1 + s2 * z2
