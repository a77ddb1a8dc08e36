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


# ---------------------------------------------------------------------------
# modconv epilogue fusion
# ---------------------------------------------------------------------------


def _epilogue_jnp(out, demod, noise, nw, bias):
    from rick_tpu.ops.fused_act import fused_leaky_relu

    v = out * demod[:, :, None, None] + nw * noise
    return fused_leaky_relu(v, bias)


@pytest.mark.parametrize("shape", [(2, 8, 16, 16), (3, 5, 7, 9)])
def test_modconv_epilogue_pallas_matches_jnp(shape):
    from rick_tpu.ops.pallas_kernels import modconv_epilogue_pallas

    B, C, H, W = shape
    out = jnp.asarray(_rand(shape))
    demod = jnp.asarray(np.abs(_rand((B, C), 1)) + 0.1)
    noise = jnp.asarray(_rand((B, 1, H, W), 2))
    nw = jnp.asarray(0.7, jnp.float32)
    bias = jnp.asarray(_rand((C,), 3))
    got = modconv_epilogue_pallas(out, demod, noise, nw, bias, 0.2, 2.0**0.5, True)
    want = _epilogue_jnp(out, demod, noise, nw, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_modconv_epilogue_pallas_grads_match():
    from rick_tpu.ops.pallas_kernels import modconv_epilogue_pallas

    B, C, H, W = 2, 4, 8, 8
    out = jnp.asarray(_rand((B, C, H, W)))
    demod = jnp.asarray(np.abs(_rand((B, C), 1)) + 0.1)
    noise = jnp.asarray(_rand((B, 1, H, W), 2))
    nw = jnp.asarray(0.7, jnp.float32)
    bias = jnp.asarray(_rand((C,), 3))

    def loss_p(*a):
        return jnp.sum(modconv_epilogue_pallas(*a, 0.2, 2.0**0.5, True) ** 2)

    def loss_j(*a):
        return jnp.sum(_epilogue_jnp(*a) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(out, demod, noise, nw, bias)
    gj = jax.grad(loss_j, argnums=(0, 1, 2, 3, 4))(out, demod, noise, nw, bias)
    for p, j in zip(gp, gj):
        np.testing.assert_allclose(np.asarray(p), np.asarray(j), rtol=1e-5, atol=1e-5)


def test_styled_conv_pallas_epilogue_env_path(monkeypatch):
    """RICK_PALLAS_EPILOGUE=1 produces the same StyledConv output and grads as
    the default XLA path (interpret mode on CPU)."""
    from rick_tpu.nn.blocks import styled_conv_apply, styled_conv_init

    params = styled_conv_init(jax.random.key(0), 8, 8, 3, 16)
    x = jnp.asarray(_rand((2, 8, 8, 8)))
    style = jnp.asarray(_rand((2, 16), 1))
    noise = jnp.asarray(_rand((2, 1, 8, 8), 2))

    want = styled_conv_apply(params, x, style, noise)
    monkeypatch.setenv("RICK_PALLAS_EPILOGUE", "1")
    got = styled_conv_apply(params, x, style, noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    def loss(p):
        return jnp.sum(styled_conv_apply(p, x, style, noise) ** 2)

    g_pallas = jax.grad(loss)(params)
    monkeypatch.delenv("RICK_PALLAS_EPILOGUE")
    g_xla = jax.grad(loss)(params)
    for kp, kx in zip(jax.tree.leaves(g_pallas), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(kp), np.asarray(kx), rtol=1e-4, atol=1e-5)


def test_pallas_epilogue_path_phase_double_backward(monkeypatch):
    """The path-length phase differentiates THROUGH a gradient; custom_vjp
    kernels don't support that, so path_phase must trace the XLA epilogue even
    under RICK_PALLAS_EPILOGUE=1 (trace-time no_pallas_epilogue gate)."""
    from rick_tpu.nn import DiscriminatorConfig, GeneratorConfig
    from rick_tpu.train import TrainConfig, init_train_state, make_train_step, run_iteration

    monkeypatch.setenv("RICK_PALLAS_EPILOGUE", "1")
    gcfg = GeneratorConfig(size=16)
    dcfg = DiscriminatorConfig(size=16)
    tcfg = TrainConfig(batch=2, augment=False, warmup_iter=0, g_reg_every=1, d_reg_every=1)
    state = init_train_state(jax.random.key(0), gcfg, dcfg, tcfg)
    phases = make_train_step(gcfg, dcfg, tcfg)
    # i=0 runs d, r1, g AND path -- the crash case
    state, m = run_iteration(phases, state, jax.random.normal(jax.random.key(1), (2, 3, 16, 16)),
                             jax.random.key(2), 0, tcfg)
    assert np.isfinite(float(m["path"]))
    assert np.isfinite(float(m["g"]))
