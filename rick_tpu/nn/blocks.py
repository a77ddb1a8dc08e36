"""Functional StyleGAN2 building blocks.

Each block is an (init, apply) pair over plain pytrees.  Reference semantics:
`gan_training/models/model_probe_tune.py:21-370`.  Weight shapes are the
natural JAX ones; `rick_tpu/ckpt/convert.py` maps them to/from the rosinality
torch layout (e.g. the reference's 5-D modconv weight `(1,out,in,k,k)` is
stored here as `(out,in,k,k)`).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from rick_tpu.ops import blur, fused_leaky_relu, make_kernel, upfirdn2d, upsample2d


def pixel_norm(x: jnp.ndarray) -> jnp.ndarray:
    """`PixelNorm` (`model_probe_tune.py:21-26`): normalize over dim 1."""
    return x * lax.rsqrt(jnp.mean(x * x, axis=1, keepdims=True) + 1e-8)


# ---------------------------------------------------------------------------
# EqualLinear (`model_probe_tune.py:139-173`)
# ---------------------------------------------------------------------------


def equal_linear_init(key, in_dim: int, out_dim: int, lr_mul: float = 1.0, bias_init: float = 0.0):
    w = jax.random.normal(key, (out_dim, in_dim), jnp.float32) / lr_mul
    b = jnp.full((out_dim,), bias_init, jnp.float32)
    return {"weight": w, "bias": b}


def equal_linear_apply(params, x, *, lr_mul: float = 1.0, activation: Optional[str] = None):
    in_dim = params["weight"].shape[1]
    scale = (1.0 / math.sqrt(in_dim)) * lr_mul
    w = params["weight"].astype(x.dtype) * scale
    b = params["bias"].astype(x.dtype) * lr_mul
    if activation == "fused_lrelu":
        out = x @ w.T
        return fused_leaky_relu(out, b)
    return x @ w.T + b


# ---------------------------------------------------------------------------
# EqualConv2d (`model_probe_tune.py:101-136`)
# ---------------------------------------------------------------------------


def equal_conv2d_init(key, in_ch: int, out_ch: int, kernel_size: int, bias: bool = True):
    w = jax.random.normal(key, (out_ch, in_ch, kernel_size, kernel_size), jnp.float32)
    p = {"weight": w}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def conv2d(x, w, *, stride: int = 1, padding: int = 0):
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def equal_conv2d_apply(params, x, *, stride: int = 1, padding: int = 0):
    out_ch, in_ch, kh, kw = params["weight"].shape
    scale = 1.0 / math.sqrt(in_ch * kh * kw)
    out = conv2d(x, params["weight"].astype(x.dtype) * scale, stride=stride, padding=padding)
    if "bias" in params:
        out = out + params["bias"].astype(x.dtype).reshape(1, -1, 1, 1)
    return out


# ---------------------------------------------------------------------------
# ModulatedConv2d (`model_probe_tune.py:188-284`)
# ---------------------------------------------------------------------------


def modulated_conv2d_init(key, in_ch: int, out_ch: int, kernel_size: int, style_dim: int):
    kw, km = jax.random.split(key)
    return {
        "weight": jax.random.normal(kw, (out_ch, in_ch, kernel_size, kernel_size), jnp.float32),
        "modulation": equal_linear_init(km, style_dim, in_ch, bias_init=1.0),
    }


def _conv_transpose2x(x, w):
    """torch `F.conv_transpose2d(x, w, stride=2, padding=0)` with w:(in,out,k,k).

    Expressed as an input-dilated correlation with the spatially-flipped,
    in/out-swapped kernel; output size (h-1)*2 + k.
    """
    in_ch, out_ch, kh, kw = w.shape
    wt = jnp.flip(w, (2, 3)).transpose(1, 0, 2, 3)  # (out,in,k,k), flipped
    return lax.conv_general_dilated(
        x,
        wt,
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def modulated_conv2d_apply(
    params,
    x,
    style,
    *,
    demodulate: bool = True,
    upsample: bool = False,
    downsample: bool = False,
    blur_kernel: Sequence[int] = (1, 3, 3, 1),
    _defer_demod: bool = False,
):
    """Style-modulated conv via the scale-input / demod-output identity.

    Reference builds per-sample weights `w' = scale * w * style` and runs a
    grouped conv with groups=batch (`model_probe_tune.py:243-284`).  Because
    convolution is linear in the per-input-channel style scaling and in the
    per-output-channel demodulation, the identical result is:

        y = demod[b,o] * conv(x * style[b,i], scale * w)

    with demod computed in closed form:
        demod[b,o] = rsqrt( sum_i style[b,i]^2 * (scale^2 sum_kk w[o,i]^2) + 1e-8 )

    which keeps ONE batch-shared weight on the MXU (no groups=batch reshape).
    """
    batch, in_ch, h, w_sp = x.shape
    out_ch, _, kh, kw = params["weight"].shape
    scale = 1.0 / math.sqrt(in_ch * kh * kw)

    s = equal_linear_apply(params["modulation"], style)  # (B, in_ch)
    weight = params["weight"].astype(x.dtype) * scale

    if demodulate:
        w2 = jnp.sum((weight * weight).astype(jnp.float32), axis=(2, 3))  # (out,in)
        sigma = jnp.einsum("bi,oi->bo", (s * s).astype(jnp.float32), w2)
        demod = lax.rsqrt(sigma + 1e-8).astype(x.dtype)  # (B, out)

    xs = x * s[:, :, None, None].astype(x.dtype)

    if upsample:
        # torch path: conv_transpose2d(stride=2) with weight (in,out,k,k), then Blur
        out = _conv_transpose2x(xs, weight.transpose(1, 0, 2, 3))
        if demodulate:
            out = out * demod[:, :, None, None]
        factor = 2
        p = (len(blur_kernel) - factor) - (kh - 1)
        pad0 = (p + 1) // 2 + factor - 1
        pad1 = p // 2 + 1
        out = blur(out, jnp.asarray(blur_kernel, jnp.float32), pad=(pad0, pad1), upsample_factor=factor)
    elif downsample:
        factor = 2
        p = (len(blur_kernel) - factor) + (kh - 1)
        pad0 = (p + 1) // 2
        pad1 = p // 2
        xs = blur(xs, jnp.asarray(blur_kernel, jnp.float32), pad=(pad0, pad1))
        out = conv2d(xs, weight, stride=2, padding=0)
        if demodulate:
            out = out * demod[:, :, None, None]
    else:
        out = conv2d(xs, weight, stride=1, padding=kh // 2)
        if _defer_demod and demodulate:
            # caller fuses demod into its epilogue (Pallas path)
            return out, demod
        if demodulate:
            out = out * demod[:, :, None, None]

    return out


# ---------------------------------------------------------------------------
# NoiseInjection / ConstantInput / StyledConv / ToRGB
# (`model_probe_tune.py:287-370`)
# ---------------------------------------------------------------------------


def styled_conv_init(key, in_ch, out_ch, kernel_size, style_dim):
    kc, = jax.random.split(key, 1)
    return {
        "conv": modulated_conv2d_init(kc, in_ch, out_ch, kernel_size, style_dim),
        "noise_weight": jnp.zeros((), jnp.float32),
        "act_bias": jnp.zeros((out_ch,), jnp.float32),
    }


_PALLAS_EPILOGUE_OK = True  # trace-time gate; see no_pallas_epilogue()


class no_pallas_epilogue:
    """Trace-time context disabling the Pallas epilogue: custom_vjp kernels do
    not support grad-of-grad, so double-backward phases (path-length reg)
    trace the plain XLA formulation even under RICK_PALLAS_EPILOGUE=1."""

    def __enter__(self):
        global _PALLAS_EPILOGUE_OK
        self._prev = _PALLAS_EPILOGUE_OK
        _PALLAS_EPILOGUE_OK = False

    def __exit__(self, *exc):
        global _PALLAS_EPILOGUE_OK
        _PALLAS_EPILOGUE_OK = self._prev


def styled_conv_apply(params, x, style, noise, *, upsample=False, blur_kernel=(1, 3, 3, 1), fast=False):
    """StyledConv = ModulatedConv2d + NoiseInjection + FusedLeakyReLU
    (`model_probe_tune.py:314-348`). `noise` is (B,1,H,W) or None.

    `fast=True` routes the upsample path through the fused Pallas kernel
    (`ops/fused_upsample.py`): convT + blur + demod + noise + bias + lrelu in
    one VMEM pass, skipping the mid activation's HBM round trips.  Forward
    only (no custom VJP) -- use on inference/eval paths (g_ema generation).

    RICK_PALLAS_EPILOGUE=1 fuses demod + noise + bias + lrelu into one Pallas
    VMEM pass on the non-upsample path (opt-in; see ops/pallas_kernels.py for
    the measured comparison vs XLA's automatic fusion)."""
    import os

    if (
        fast
        and upsample
        and params["conv"]["weight"].shape[2] == 3
        and len(blur_kernel) == 4
        # measured win region (scripts/bench_ops.py, v5e): the fused kernel
        # beats the XLA chain at the small layers (one pass vs 4 dispatches)
        # and loses at the large traffic-dominated ones, where its blend
        # pipeline costs more VMEM passes than the saved HBM round trips
        and x.shape[2] <= int(os.environ.get("RICK_FUSED_UPSAMPLE_MAX_H", "16"))
    ):
        from rick_tpu.ops.fused_upsample import convt_blur_act

        batch, in_ch = x.shape[0], x.shape[1]
        kh = 3
        scale = 1.0 / math.sqrt(in_ch * kh * kh)
        s = equal_linear_apply(params["conv"]["modulation"], style)  # (B, in)
        weight = params["conv"]["weight"].astype(x.dtype) * scale
        w2 = jnp.sum((weight * weight).astype(jnp.float32), axis=(2, 3))
        sigma = jnp.einsum("bi,oi->bo", (s * s).astype(jnp.float32), w2)
        demod = lax.rsqrt(sigma + 1e-8)
        xs = x * s[:, :, None, None].astype(x.dtype)
        h2, w2_sp = 2 * x.shape[2], 2 * x.shape[3]
        if noise is None:
            noise_s = jnp.zeros((1, 1, h2, w2_sp), jnp.float32)
        else:
            noise_s = noise.astype(jnp.float32) * params["noise_weight"].astype(jnp.float32)
        return convt_blur_act(
            xs, weight, demod, noise_s, params["act_bias"],
            blur_kernel=blur_kernel,
            interpret=jax.default_backend() == "cpu",
        )

    if (
        not upsample
        and noise is not None
        and _PALLAS_EPILOGUE_OK
        and os.environ.get("RICK_PALLAS_EPILOGUE") == "1"
    ):
        from rick_tpu.ops.pallas_kernels import modconv_epilogue_pallas

        out, demod = modulated_conv2d_apply(
            params["conv"], x, style, demodulate=True, blur_kernel=blur_kernel,
            _defer_demod=True,
        )
        return modconv_epilogue_pallas(
            out, demod, noise.astype(out.dtype),
            params["noise_weight"].astype(out.dtype),
            params["act_bias"].astype(out.dtype),
            0.2, 2.0**0.5,
            jax.default_backend() == "cpu",  # interpret mode off-TPU
        )

    out = modulated_conv2d_apply(
        params["conv"], x, style, demodulate=True, upsample=upsample, blur_kernel=blur_kernel
    )
    if noise is not None:
        out = out + params["noise_weight"].astype(out.dtype) * noise.astype(out.dtype)
    return fused_leaky_relu(out, params["act_bias"])


def to_rgb_init(key, in_ch, style_dim):
    kc, = jax.random.split(key, 1)
    return {
        "conv": modulated_conv2d_init(kc, in_ch, 3, 1, style_dim),
        "bias": jnp.zeros((1, 3, 1, 1), jnp.float32),
    }


def to_rgb_apply(params, x, style, skip=None, *, blur_kernel=(1, 3, 3, 1)):
    """ToRGB (`model_probe_tune.py:351-370`): 1x1 mod conv (no demod) + bias,
    with 2x antialiased upsample of the accumulated skip."""
    out = modulated_conv2d_apply(params["conv"], x, style, demodulate=False)
    out = out + params["bias"].astype(out.dtype)
    if skip is not None:
        skip = upsample2d(skip, jnp.asarray(blur_kernel, jnp.float32), factor=2)
        out = out + skip
    return out


# ---------------------------------------------------------------------------
# Discriminator blocks (`model_probe_tune.py:595-660`)
# ---------------------------------------------------------------------------


def conv_layer_init(key, in_ch, out_ch, kernel_size, *, bias=True, activate=True):
    p = {"weight": jax.random.normal(key, (out_ch, in_ch, kernel_size, kernel_size), jnp.float32)}
    if activate and bias:
        p["act_bias"] = jnp.zeros((out_ch,), jnp.float32)
    elif bias and not activate:
        p["bias"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def conv_layer_apply(params, x, *, downsample=False, activate=True, blur_kernel=(1, 3, 3, 1)):
    """ConvLayer: [Blur] + EqualConv2d + [FusedLeakyReLU] (`model_probe_tune.py:595-641`)."""
    out_ch, in_ch, kh, kw = params["weight"].shape
    if downsample:
        factor = 2
        p = (len(blur_kernel) - factor) + (kh - 1)
        pad0 = (p + 1) // 2
        pad1 = p // 2
        x = blur(x, jnp.asarray(blur_kernel, jnp.float32), pad=(pad0, pad1))
        stride, padding = 2, 0
    else:
        stride, padding = 1, kh // 2

    scale = 1.0 / math.sqrt(in_ch * kh * kw)
    out = conv2d(x, params["weight"].astype(x.dtype) * scale, stride=stride, padding=padding)
    if "bias" in params:
        out = out + params["bias"].astype(x.dtype).reshape(1, -1, 1, 1)
    if activate:
        if "act_bias" in params:
            out = fused_leaky_relu(out, params["act_bias"])
        else:
            out = fused_leaky_relu(out, None)
    return out


def res_block_init(key, in_ch, out_ch):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": conv_layer_init(k1, in_ch, in_ch, 3),
        "conv2": conv_layer_init(k2, in_ch, out_ch, 3),
        "skip": conv_layer_init(k3, in_ch, out_ch, 1, bias=False, activate=False),
    }


def res_block_apply(params, x, *, blur_kernel=(1, 3, 3, 1)):
    """ResBlock (`model_probe_tune.py:644-660`): returns (out, conv1_feat, conv2_feat)."""
    f1 = conv_layer_apply(params["conv1"], x, blur_kernel=blur_kernel)
    f2 = conv_layer_apply(params["conv2"], f1, downsample=True, blur_kernel=blur_kernel)
    skip = conv_layer_apply(params["skip"], x, downsample=True, activate=False, blur_kernel=blur_kernel)
    out = (f2 + skip) / math.sqrt(2.0)
    return out, f1, f2


def minibatch_stddev(x, *, stddev_group=25, stddev_feat=1, splits=1):
    """Minibatch stddev with group size min(batch, 25) (`model_probe_tune.py:748-756`).

    `splits=s` treats the batch as `s` independent contiguous sub-batches and
    computes the group statistics within each one — exactly equivalent to `s`
    separate calls on the halves.  This allows running D on concat([real,
    fake]) as ONE batched forward (the reference calls D twice,
    `train_dynamic_update_prune.py:407-410`) without mixing real and fake
    images inside a stddev group.  NOTE: the trainer measured that formulation
    and kept the two-call one — on v5e the batch-4 fused D fwd+bwd is ~3-8 ms
    SLOWER per iteration than two batch-2 calls (ROUND4.md); the support stays
    because the equivalence is load-bearing for any future batched use.
    """
    batch, channel, height, width = x.shape
    if splits == 1:
        group = min(batch, stddev_group)
        y = x.reshape(group, -1, stddev_feat, channel // stddev_feat, height, width)
        var = jnp.var(y, axis=0)  # (B//group, feat, C//feat, H, W)
        stddev = jnp.sqrt(var + 1e-8)
        stddev = jnp.mean(stddev, axis=(2, 3, 4), keepdims=True)
        stddev = jnp.squeeze(stddev, axis=2)  # (B//group, feat=1, 1, 1)
        stddev = jnp.tile(stddev, (group, 1, height, width))
        return jnp.concatenate([x, stddev.astype(x.dtype)], axis=1)

    assert batch % splits == 0, (batch, splits)
    b = batch // splits  # per-split batch, matching a standalone call on it
    group = min(b, stddev_group)
    y = x.reshape(splits, group, b // group, stddev_feat, channel // stddev_feat, height, width)
    var = jnp.var(y, axis=1)  # (s, b//group, feat, C//feat, H, W)
    stddev = jnp.sqrt(var + 1e-8)
    stddev = jnp.mean(stddev, axis=(3, 4, 5), keepdims=True)
    stddev = jnp.squeeze(stddev, axis=3)  # (s, b//group, feat, 1, 1)
    stddev = jnp.tile(stddev, (1, group, 1, height, width))  # (s, b, feat, H, W)
    stddev = stddev.reshape(batch, stddev_feat, height, width)
    return jnp.concatenate([x, stddev.astype(x.dtype)], axis=1)
