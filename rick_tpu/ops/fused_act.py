"""Fused bias + leaky-ReLU + gain.

Reference semantics (`/root/reference/op/fused_bias_act_kernel.cu:36-45`, wrapped by
`op/fused_act.py:51-107`):

    y = leaky_relu(x + bias[c], negative_slope) * scale

with bias broadcast over the channel dim (dim 1 for >=2-D inputs, trailing dim
for 2-D linear outputs -- the CUDA kernel broadcasts over all dims after the
bias dim via its `step_b` stride math).

On TPU this is a pure VPU elementwise chain that XLA fuses into the producing
matmul/conv epilogue -- no custom kernel needed for speed-of-light.  Autodiff
gives the exact reference backward for free, including the second-order
property "d2y/dx2 == 0" that the reference encodes as its grad=2 kernel case
(`fused_bias_act_kernel.cu:44`).
"""

from __future__ import annotations

import math
import os

import jax.numpy as jnp


_SQRT2 = math.sqrt(2.0)
_USE_PALLAS = os.environ.get("RICK_PALLAS", "") == "1"


def fused_leaky_relu(x, bias=None, negative_slope: float = 0.2, scale: float = _SQRT2):
    """y = leaky_relu(x + bias) * scale, bias broadcast over dim 1.

    For 2-D inputs (N, C) the bias applies to the last dim; for N-D inputs the
    bias applies to dim 1 and broadcasts over trailing spatial dims, matching
    the reference's channel-dim convention.  RICK_PALLAS=1 routes through the
    explicit Pallas kernel (`ops/pallas_kernels.py`).
    """
    if _USE_PALLAS and bias is not None:
        from rick_tpu.ops.pallas_kernels import fused_bias_act_pallas

        return fused_bias_act_pallas(x, bias, negative_slope, scale)
    if bias is not None:
        if x.ndim == 2:
            b = bias.reshape(1, -1)
        else:
            b = bias.reshape((1, -1) + (1,) * (x.ndim - 2))
        x = x + b
    return jnp.where(x >= 0, x, x * negative_slope) * scale


def scaled_leaky_relu(x, negative_slope: float = 0.2):
    """Mirror of `ScaledLeakyReLU` (`model_probe_tune.py:176-185`): no bias, gain sqrt(2)."""
    return jnp.where(x >= 0, x, x * negative_slope) * _SQRT2


def fused_leaky_relu_kml(x, bias, b_vector=None, negative_slope: float = 0.2, scale: float = _SQRT2):
    """KML (kernel-modulation) variant: the activation bias is `bias + b_vector`
    when the additive learned vector is in play, else plain `bias`
    (`op/fused_act.py:85-103`; unused by the reference trainer, kept for
    API-surface parity).  In JAX "requires_grad" is a property of the call
    site, so pass b_vector=None for the frozen path."""
    eff = bias if b_vector is None else bias + b_vector
    return fused_leaky_relu(x, eff, negative_slope, scale)
