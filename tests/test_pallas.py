"""Pallas kernel tests (interpret mode on the CPU backend): parity with the
jnp formulation, gradient + bias-gradient parity, second-order property."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rick_tpu.ops.fused_act import fused_leaky_relu
from rick_tpu.ops.pallas_kernels import fused_bias_act_pallas


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("shape", [(2, 8, 16, 16), (4, 32)])
def test_fused_bias_act_pallas_matches_jnp(shape):
    x = jnp.asarray(_rand(shape))
    c = shape[1] if len(shape) > 2 else shape[-1]
    b = jnp.asarray(_rand((c,), 1))
    got = fused_bias_act_pallas(x, b, 0.2, 2.0**0.5, True)  # interpret mode
    want = fused_leaky_relu(x, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_fused_bias_act_pallas_grads_match():
    x = jnp.asarray(_rand((2, 4, 8, 8)))
    b = jnp.asarray(_rand((4,), 1))

    def loss_pallas(x, b):
        return jnp.sum(fused_bias_act_pallas(x, b, 0.2, 2.0**0.5, True) ** 2)

    def loss_jnp(x, b):
        return jnp.sum(fused_leaky_relu(x, b) ** 2)

    gx_p, gb_p = jax.grad(loss_pallas, argnums=(0, 1))(x, b)
    gx_j, gb_j = jax.grad(loss_jnp, argnums=(0, 1))(x, b)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_j), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_j), rtol=1e-5, atol=1e-5)


def test_fused_bias_act_pallas_ragged_tiles():
    # shapes not divisible by the tile sizes exercise edge-block masking
    x = jnp.asarray(_rand((3, 5, 7, 9)))
    b = jnp.asarray(_rand((5,), 2))
    got = fused_bias_act_pallas(x, b, 0.2, 2.0**0.5, True)
    want = fused_leaky_relu(x, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
