"""Block-level parity tests.

The modulated conv is validated against an independent torch oracle that uses
the per-sample grouped-weight formulation (built here from the StyleGAN2 paper
math, not from the reference code): w'[b] = scale * w * s[b], optional
demodulation by rsqrt(sum w'^2), grouped conv with groups=batch.  Our JAX
implementation uses the scale-input/demod-output identity; agreement between
the two validates the identity numerically.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from rick_tpu.nn.blocks import (
    conv_layer_apply,
    equal_conv2d_apply,
    equal_linear_apply,
    minibatch_stddev,
    modulated_conv2d_apply,
    pixel_norm,
)
from rick_tpu.ops.resample import upfirdn2d_numpy_oracle


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def torch_modconv_oracle(x, weight, style_s, demodulate, upsample, blur_kernel=(1, 3, 3, 1)):
    """Per-sample grouped-weight modulated conv in torch (independent oracle).

    x: (B, in, H, W); weight: (out, in, k, k); style_s: (B, in) the *already
    modulated* style vector (after the EqualLinear).
    """
    x = torch.from_numpy(x)
    w = torch.from_numpy(weight)
    s = torch.from_numpy(style_s)
    B, in_ch, H, W = x.shape
    out_ch, _, k, _ = w.shape
    scale = 1.0 / math.sqrt(in_ch * k * k)

    wp = scale * w[None] * s.view(B, 1, in_ch, 1, 1)  # (B, out, in, k, k)
    if demodulate:
        demod = torch.rsqrt(wp.pow(2).sum([2, 3, 4]) + 1e-8)
        wp = wp * demod.view(B, out_ch, 1, 1, 1)

    if upsample:
        xg = x.reshape(1, B * in_ch, H, W)
        wt = wp.transpose(1, 2).reshape(B * in_ch, out_ch, k, k)
        out = F.conv_transpose2d(xg, wt, padding=0, stride=2, groups=B)
        out = out.reshape(B, out_ch, out.shape[-2], out.shape[-1]).numpy()
        # blur: upfirdn2d with the normalized blur kernel * factor^2
        bk = np.asarray(blur_kernel, np.float64)
        bk = np.outer(bk, bk)
        bk = bk / bk.sum() * 4
        p = (len(blur_kernel) - 2) - (k - 1)
        pad0 = (p + 1) // 2 + 1
        pad1 = p // 2 + 1
        out = upfirdn2d_numpy_oracle(out, bk, 1, 1, 1, 1, pad0, pad1, pad0, pad1)
    else:
        xg = x.reshape(1, B * in_ch, H, W)
        wg = wp.reshape(B * out_ch, in_ch, k, k)
        out = F.conv2d(xg, wg, padding=k // 2, groups=B)
        out = out.reshape(B, out_ch, H, W).numpy()
    return out


class _NoMod:
    """Identity 'modulation' params so we can feed style_s directly."""

    @staticmethod
    def make(in_ch):
        return {"weight": jnp.eye(in_ch, dtype=jnp.float32) * math.sqrt(in_ch), "bias": jnp.zeros((in_ch,))}


@pytest.mark.parametrize("demod", [True, False])
@pytest.mark.parametrize("upsample", [False, True])
def test_modulated_conv_matches_grouped_oracle(demod, upsample):
    B, in_ch, out_ch, k, H = 3, 8, 16, 3, 7
    x = _rand((B, in_ch, H, H), 0)
    w = _rand((out_ch, in_ch, k, k), 1)
    s = _rand((B, in_ch), 2) + 2.0  # keep away from zero

    params = {"weight": jnp.asarray(w), "modulation": _NoMod.make(in_ch)}
    # identity modulation: equal_linear(scale=1/sqrt(in)*1) @ eye*sqrt(in) = identity
    got = modulated_conv2d_apply(
        params, jnp.asarray(x), jnp.asarray(s), demodulate=demod, upsample=upsample
    )
    want = torch_modconv_oracle(x, w, s, demod, upsample)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_equal_linear_matches_torch():
    x = _rand((4, 16))
    w = _rand((8, 16), 1)
    b = _rand((8,), 2)
    params = {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
    lr_mul = 0.01
    got = equal_linear_apply(params, jnp.asarray(x), lr_mul=lr_mul)
    want = x @ (w.T * (1 / math.sqrt(16) * lr_mul)) + b * lr_mul
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_equal_conv2d_matches_torch():
    x = _rand((2, 4, 8, 8))
    w = _rand((6, 4, 3, 3), 1)
    b = _rand((6,), 2)
    params = {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
    got = equal_conv2d_apply(params, jnp.asarray(x), padding=1)
    want = F.conv2d(
        torch.from_numpy(x), torch.from_numpy(w) / math.sqrt(4 * 9), torch.from_numpy(b), padding=1
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_pixel_norm():
    x = _rand((2, 512))
    got = pixel_norm(jnp.asarray(x))
    want = x / np.sqrt((x**2).mean(axis=1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_minibatch_stddev_matches_torch_formula():
    # batch 4, group min(4,25)=4
    x = _rand((4, 8, 5, 5))
    out = minibatch_stddev(jnp.asarray(x), stddev_group=25)
    assert out.shape == (4, 9, 5, 5)
    xt = torch.from_numpy(x)
    y = xt.view(4, -1, 1, 8, 5, 5)
    std = torch.sqrt(y.var(0, unbiased=False) + 1e-8)
    std = std.mean([2, 3, 4], keepdims=True).squeeze(2)
    std = std.repeat(4, 1, 5, 5)
    want = torch.cat([xt, std], 1).numpy()
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_minibatch_stddev_splits_equals_separate_calls():
    """splits=s on concat([a, b]) must equal concat of standalone calls:
    stddev groups never mix the halves.  (The batched real+fake D forward
    built on this was measured SLOWER than two calls on v5e — ROUND4.md —
    so the trainer keeps two calls; the invariant stays guarded here.)"""
    for batch, splits, group in [(8, 2, 25), (12, 2, 3), (12, 3, 4)]:
        x = _rand((batch, 8, 5, 5), seed=batch + splits)
        got = minibatch_stddev(jnp.asarray(x), stddev_group=group, splits=splits)
        b = batch // splits
        want = np.concatenate(
            [
                np.asarray(
                    minibatch_stddev(jnp.asarray(x[i * b : (i + 1) * b]), stddev_group=group)
                )
                for i in range(splits)
            ],
            axis=0,
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_conv_layer_downsample_shape():
    x = jnp.asarray(_rand((2, 4, 16, 16)))
    params = {"weight": jnp.asarray(_rand((8, 4, 3, 3), 1)), "act_bias": jnp.zeros((8,))}
    out = conv_layer_apply(params, x, downsample=True)
    assert out.shape == (2, 8, 8, 8)
