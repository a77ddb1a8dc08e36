"""Pallas TPU kernels for the L0 ops.

The reference ships CUDA kernels for fused_bias_act and upfirdn2d because
torch would otherwise materialize intermediates.  Under XLA most of that
fusion is automatic -- the jnp formulations in `ops/fused_act.py` fuse into
producer epilogues, and `ops/resample.py` is a single conv.  This module
provides explicit Pallas implementations for the cases where hand control
matters (and as the kernel-layer foundation for future fusions):

  * `fused_bias_act_pallas`: y = leaky_relu(x + b[c]) * scale as a tiled VMEM
    kernel with a custom_vjp whose backward re-derives the activation sign
    from the OUTPUT (the reference kernel's grad=1 `ref` trick,
    `op/fused_bias_act_kernel.cu:36-45`), so no extra residual is stored and
    second-order derivatives (d2y/dx2 == 0 away from the kink) are preserved.

Dispatch: `rick_tpu.ops.fused_act.fused_leaky_relu` uses the Pallas path when
RICK_PALLAS=1; the jnp path is the default.  Measured on v5e (8x512x64x64
fp32, standalone): XLA epilogue 0.75 ms vs this kernel 1.75 ms, with exact
output parity -- XLA's automatic fusion wins for a pure elementwise op, which
is why the reference's CUDA-era fusion does not warrant a hand kernel on TPU.
The kernel remains the scaffold for fusions XLA cannot do (e.g. folding the
activation into a Pallas modconv epilogue).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# fused bias + leaky relu + gain
# ---------------------------------------------------------------------------


def _fba_fwd_kernel(x_ref, b_ref, o_ref, *, slope: float, scale: float):
    v = x_ref[:] + b_ref[:]
    o_ref[:] = jnp.where(v >= 0, v, v * slope) * scale


def _fba_bwd_kernel(g_ref, y_ref, o_ref, *, slope: float, scale: float):
    # activation sign recovered from the saved OUTPUT (ref trick): y >= 0 iff
    # the pre-activation was >= 0 (scale > 0)
    pos = y_ref[:] >= 0
    o_ref[:] = jnp.where(pos, g_ref[:], g_ref[:] * slope) * scale


def _rows_view(x: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    """(N, C, ...) -> (N*C, S) rows with S = prod(spatial dims)."""
    shape = x.shape
    n, c = shape[0], shape[1]
    s = 1
    for d in shape[2:]:
        s *= d
    return x.reshape(n * c, max(s, 1)), shape


def _bias_rows(bias: jnp.ndarray, n: int, c: int) -> jnp.ndarray:
    return jnp.tile(bias.reshape(1, c), (n, 1)).reshape(n * c, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_bias_act_pallas(x, bias, slope: float = 0.2, scale: float = 2.0**0.5, interpret: bool = False):
    return _fba_forward(x, bias, slope, scale, interpret)


def _fba_call(kernel, a, b, slope, scale, interpret):
    R, S = a.shape
    TR = min(256, R)
    TS = min(512, S)
    grid = (_cdiv(R, TR), _cdiv(S, TS))
    return pl.pallas_call(
        functools.partial(kernel, slope=slope, scale=scale),
        out_shape=jax.ShapeDtypeStruct((R, S), a.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, TS), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TR, 1 if b.shape[1] == 1 else TS),
                (lambda i, j: (i, 0)) if b.shape[1] == 1 else (lambda i, j: (i, j)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((TR, TS), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b)


def _fba_forward(x, bias, slope, scale, interpret):
    n, c = x.shape[0], x.shape[1] if x.ndim > 1 else 1
    if x.ndim == 2:
        # linear outputs: bias along the last dim
        a = x
        b = jnp.tile(bias.reshape(1, -1), (x.shape[0], 1))
        out = _fba_call(_fba_fwd_kernel, a, b, slope, scale, interpret)
        return out
    a, shape = _rows_view(x)
    b = _bias_rows(bias, n, c)
    out = _fba_call(_fba_fwd_kernel, a, b, slope, scale, interpret)
    return out.reshape(shape)


def _fba_fwd_rule(x, bias, slope, scale, interpret):
    y = _fba_forward(x, bias, slope, scale, interpret)
    return y, (y, x.shape, bias.shape)


def _fba_bwd_rule(slope, scale, interpret, res, g):
    y, x_shape, b_shape = res
    if len(x_shape) == 2:
        gy = _fba_call(_fba_bwd_kernel, g, y, slope, scale, interpret)
        gb = jnp.sum(gy, axis=0)
        return gy, gb.reshape(b_shape)
    n, c = x_shape[0], x_shape[1]
    g2, _ = _rows_view(g)
    y2, _ = _rows_view(y)
    gy = _fba_call(_fba_bwd_kernel, g2, y2, slope, scale, interpret)
    gx = gy.reshape(x_shape)
    # grad_bias: sum over batch + spatial dims (`op/fused_act.py:32-37`)
    gb = jnp.sum(gx, axis=(0,) + tuple(range(2, len(x_shape))))
    return gx, gb.reshape(b_shape)


fused_bias_act_pallas.defvjp(_fba_fwd_rule, _fba_bwd_rule)


# ---------------------------------------------------------------------------
# modconv epilogue: demod * out + noise_weight * noise + bias -> lrelu -> gain
# ---------------------------------------------------------------------------
#
# SURVEY par. 7.2 step 9's fusion target: the chain after every non-upsample
# modulated conv (`model_probe_tune.py:243-284` epilogue + NoiseInjection +
# FusedLeakyReLU, `:287-348`) in ONE VMEM pass.  XLA fuses the same chain into
# one elementwise fusion automatically; this kernel exists to measure whether
# hand control wins.  Measured on v5e (256px batch-2 train step, phase-mix
# avg): 108.2 ms with this kernel vs 105.0 ms XLA — XLA's automatic epilogue
# fusion wins, same verdict as fused_bias_act above.  Gated opt-in via
# RICK_PALLAS_EPILOGUE=1 in nn/blocks.styled_conv_apply; the double-backward
# path phase traces the XLA formulation via blocks.no_pallas_epilogue
# (custom_vjp kernels cannot be differentiated twice).


def _epi_fwd_kernel(out_ref, dem_ref, noi_ref, b_ref, nw_ref, o_ref, *, slope, scale):
    v = (
        out_ref[0]  # (TC, TS)
        * dem_ref[0]  # (TC, 1) broadcast
        + nw_ref[0, 0] * noi_ref[0]  # (1, TS) broadcast
        + b_ref[0]  # (TC, 1) broadcast
    )
    o_ref[0] = jnp.where(v >= 0, v, v * slope) * scale


def _epi_forward(out, demod, noise, noise_weight, bias, slope, scale, interpret):
    # TPU tiling: every block's last two dims must be (8k, 128k) or equal the
    # array dims, so the per-channel / per-pixel operands are shaped 3-D with
    # a trailing/leading singleton that is ALWAYS "equal to the array dim".
    B, C, H, W = out.shape
    S = H * W
    o2 = out.reshape(B, C, S)
    d3 = demod.reshape(B, C, 1)
    n3 = noise.reshape(B, 1, S)
    b3 = bias.reshape(1, C, 1)
    nw = noise_weight.reshape(1, 1)
    TC = min(256, C)
    TS = min(512, S)
    grid = (B, _cdiv(C, TC), _cdiv(S, TS))
    y = pl.pallas_call(
        functools.partial(_epi_fwd_kernel, slope=slope, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, C, S), out.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TC, TS), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TC, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TS), lambda b, i, j: (b, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TC, 1), lambda b, i, j: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TC, TS), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(o2, d3, n3, b3, nw)
    return y.reshape(B, C, H, W)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def modconv_epilogue_pallas(
    out, demod, noise, noise_weight, bias,
    slope: float = 0.2, scale: float = 2.0**0.5, interpret: bool = False,
):
    """y = leaky_relu(out * demod[b,c] + nw * noise[b,1,h,w] + bias[c]) * scale.

    Forward is one Pallas VMEM pass; backward re-derives the activation sign
    from the OUTPUT (the reference CUDA kernel's grad `ref` trick,
    `op/fused_bias_act_kernel.cu:36-45`) and runs as plain jnp (one XLA
    elementwise fusion + the four reductions autodiff would emit anyway).
    """
    return _epi_forward(out, demod, noise, noise_weight, bias, slope, scale, interpret)


def _epi_fwd_rule(out, demod, noise, noise_weight, bias, slope, scale, interpret):
    y = _epi_forward(out, demod, noise, noise_weight, bias, slope, scale, interpret)
    return y, (y, out, demod, noise, noise_weight)


def _epi_bwd_rule(slope, scale, interpret, res, g):
    y, out, demod, noise, noise_weight = res
    g_pre = jnp.where(y >= 0, g, g * slope) * scale
    d_out = g_pre * demod[:, :, None, None]
    d_demod = jnp.sum(g_pre * out, axis=(2, 3))
    d_noise = (noise_weight * jnp.sum(g_pre, axis=1, keepdims=True)).astype(noise.dtype)
    d_nw = jnp.sum(g_pre * noise)
    d_bias = jnp.sum(g_pre, axis=(0, 2, 3))
    return d_out, d_demod, d_noise, d_nw.reshape(()), d_bias


modconv_epilogue_pallas.defvjp(_epi_fwd_rule, _epi_bwd_rule)
