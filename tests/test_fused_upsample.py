"""Parity tests for the fused Pallas upsample kernel (ops/fused_upsample.py).

The XLA-chain oracle `convt_blur_act_ref` replicates the reference op sequence
(`model_probe_tune.py:257-268` + `:314-348`); with bf16-representable inputs
the kernel's bf16 matmuls are exact, so parity is checked at f32 reassociation
tolerance.  Runs in Pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rick_tpu.ops.fused_upsample import convt_blur_act, convt_blur_act_ref


def bf(a):
    return a.astype(jnp.bfloat16).astype(jnp.float32)


def _mk(key, N, Cin, Cout, H, noise_batch=None):
    ks = jax.random.split(key, 5)
    xs = bf(jax.random.normal(ks[0], (N, Cin, H, H)))
    w = bf(jax.random.normal(ks[1], (Cout, Cin, 3, 3)) * 0.1)
    demod = bf(jax.random.uniform(ks[2], (N, Cout), minval=0.5, maxval=1.5))
    nb = N if noise_batch is None else noise_batch
    noise = bf(jax.random.normal(ks[3], (nb, 1, 2 * H, 2 * H)) * 0.1)
    bias = bf(jax.random.normal(ks[4], (Cout,)) * 0.1)
    return xs, w, demod, noise, bias


@pytest.mark.parametrize(
    "N,Cin,Cout,H",
    [(2, 8, 8, 8), (1, 16, 8, 4), (3, 8, 16, 16), (2, 8, 8, 32), (1, 8, 256, 8)],
)
def test_kernel_matches_chain(N, Cin, Cout, H):
    with jax.default_matmul_precision("highest"):
        args = _mk(jax.random.key(N * 100 + H), N, Cin, Cout, H)
        ref = convt_blur_act_ref(*args)
        got = convt_blur_act(*args, interpret=True)
    assert got.shape == (N, Cout, 2 * H, 2 * H)
    err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 1e-5, err


def test_kernel_broadcast_noise_and_no_bias():
    with jax.default_matmul_precision("highest"):
        xs, w, demod, noise, _ = _mk(jax.random.key(7), 3, 8, 8, 8, noise_batch=1)
        ref = convt_blur_act_ref(xs, w, demod, noise, None)
        got = convt_blur_act(xs, w, demod, noise, None, interpret=True)
    err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 1e-5, err


def test_kernel_no_act():
    with jax.default_matmul_precision("highest"):
        args = _mk(jax.random.key(9), 2, 8, 8, 8)
        ref = convt_blur_act_ref(*args, use_act=False)
        got = convt_blur_act(*args, use_act=False, interpret=True)
    err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 1e-5, err


def test_styled_conv_fast_matches_slow():
    from rick_tpu.nn.blocks import styled_conv_apply, styled_conv_init

    key = jax.random.key(0)
    p = styled_conv_init(key, 8, 16, 3, 32)
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 8))
    style = jax.random.normal(jax.random.key(2), (2, 32))
    noise = jax.random.normal(jax.random.key(3), (2, 1, 16, 16))
    # give noise_weight a nonzero value so the noise path is exercised
    p = dict(p, noise_weight=jnp.float32(0.3))
    with jax.default_matmul_precision("highest"):
        slow = styled_conv_apply(p, x, style, noise, upsample=True)
        fastv = styled_conv_apply(p, x, style, noise, upsample=True, fast=True)
    err = float(jnp.max(jnp.abs(fastv - slow)) / (jnp.max(jnp.abs(slow)) + 1e-9))
    # bf16 input rounding inside the kernel: same precision class as XLA's
    # default (non-highest) f32 conv lowering
    assert err < 2e-2, err


def test_generator_fast_matches_slow():
    from rick_tpu.nn import GeneratorConfig, generator_apply, generator_init

    cfg = GeneratorConfig(size=32)
    params = generator_init(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (2, cfg.style_dim))
    with jax.default_matmul_precision("highest"):
        slow, _ = generator_apply(cfg, params, [z])
        fastv, _ = generator_apply(cfg, params, [z], fast=True)
    assert fastv.shape == slow.shape
    err = float(jnp.max(jnp.abs(fastv - slow)) / (jnp.max(jnp.abs(slow)) + 1e-9))
    assert err < 5e-2, err
