"""GAN losses, mirrors of `train_dynamic_update_prune.py:82-118`."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def d_logistic_loss(real_pred, fake_pred):
    """softplus(-real).mean() + softplus(fake).mean() (`:82-86`)."""
    return jnp.mean(jax.nn.softplus(-real_pred)) + jnp.mean(jax.nn.softplus(fake_pred))


def g_nonsaturating_loss(fake_pred):
    """softplus(-fake).mean() (`:99-101`)."""
    return jnp.mean(jax.nn.softplus(-fake_pred))


def r1_penalty(d_apply, d_params, real_img):
    """R1 gradient penalty (`:89-96`): grad of sum(D(x)) wrt x, squared,
    summed per sample, meaned over batch.  Differentiable (grad-of-grad)."""

    def score_sum(x):
        pred = d_apply(d_params, x)
        return jnp.sum(pred)

    grad_real = jax.grad(score_sum)(real_img)
    return jnp.mean(jnp.sum(grad_real.reshape(grad_real.shape[0], -1) ** 2, axis=1))


def path_stats(grad_latents, mean_path_length, *, decay=0.01):
    """Path-length statistics given d(sum(fake*noise))/d(latents)
    (`:104-118`): lengths = sqrt(mean over layers of sum over dims of grad^2);
    EMA of the mean length; penalty = mean((lengths - ema)^2)."""
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(grad_latents**2, axis=2), axis=1))
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths) - mean_path_length)
    penalty = jnp.mean((path_lengths - path_mean) ** 2)
    return penalty, jax.lax.stop_gradient(path_mean), path_lengths
