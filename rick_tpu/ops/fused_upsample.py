"""Fused upsample StyledConv: convT(3x3, stride 2) + 4-tap FIR blur + demod +
noise + bias + leaky-ReLU in ONE Pallas kernel (VERDICT r2 #5).

Reference op sequence (`gan_training/models/model_probe_tune.py:257-268` +
`:314-348`): conv_transpose2d(stride=2) -> demodulate -> Blur(upfirdn2d) ->
noise injection -> FusedLeakyReLU.  On XLA this chain pays two full HBM round
trips for the (2H+1, 2W+1) mid activation (convT write + blur read/write);
measured at the v5e HBM roofline (ROUND2.md / scripts/bench_ops.py), and the
algebraic fold into one dilated conv quadruples the MACs (measured 2x slower).
This kernel keeps the mid activation entirely in VMEM.

Derivation.  With x zero-padded by (2, 1) per spatial axis (x_pp[r] = x[r-2])
and wt = spatially-flipped weight (the convT correlation kernel), the mid rows
split into two phases on an extended index grid im in [0, H+1]:

    M0[im] = wt[u=0] . x_pp[im]   + wt[u=2] . x_pp[im+1]     (mid row 2(im-1))
    M1[im] = wt[u=1] . x_pp[im+1]                            (mid row 2(im-1)+1)

(and identically per column with v).  The convT's implicit zero pad AND the
blur's zero pad both land exactly on zero-padded x_pp rows, so no boundary
special-casing is needed.  The 9 taps wt[u, v] group into 4 shifted views of
the flat x block (dr, dc in {0,1}); one matmul per view with the concatenated
tap matrices computes all four phase arrays P_ab at full MXU shapes.  The
4-tap blur (correlation taps kb, per-axis gain 2) is then a static-coefficient
blend of phase rows/cols:

    out[2i'+0] = kb0*M1[i'-1] + kb1*M0[i'] + kb2*M1[i'] + kb3*M0[i'+1]
    out[2i'+1] = kb0*M0[i']   + kb1*M1[i'] + kb2*M0[i'+1] + kb3*M1[i'+1]

pure VPU work on VMEM-resident phases, followed by interleaving and the
elementwise epilogue.

Layout.  Everything runs TRANSPOSED: spatial on sublanes, channels on lanes
((flat_pixels, C) tiles).  Mosaic cannot lower lane-side interleave reshapes
(e.g. (CB, W, 2) -> (CB, 2W) crashes the TPU compiler), but the sublane-side
equivalent (W, CB)+(W, CB) -> (2W, CB) via stack+reshape lowers fine, and the
input arrives pre-transposed for free: the NHWC-flat prep fuses into the
style-multiply pass that materializes xs anyway.  A small per-row transpose
feeds the NCHW output block.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    xm_ref,  # (1, (TH/2)*COLS, Cin) bf16 block: this tile's main x rows
    xh_ref,  # (1, 1, 4*COLS, Cin) bf16 block: 4 halo rows below the tile
    w9_ref,  # (1, Cin, 9*CB) bf16 block; tap t=u*3+v at lanes [t*CB,(t+1)*CB)
    demod_ref,  # (1, 1, 1, CB) f32 block of demod reshaped (N, CO, 1, CB)
    noise_ref,  # (1, 1, TH*2W) f32 block (flat; pre-scaled by noise_weight)
    bias_ref,  # (1, 1, CB) f32 block of bias reshaped (CO, 1, CB)
    out_ref,  # (1, CB, TH*2W) f32 block (flat spatial; caller reshapes)
    pair_scr,  # scratch (2, FR, CB) f32: layout canonicalization for stack
    *,
    CB: int,
    COLS: int,
    W: int,
    TH: int,
    kb: tuple,
    slope: float,
    gain: float,
    use_act: bool,
):
    PR = TH // 2 + 2
    FP = PR * COLS + 2  # +2: the row blends read FR+2 rows of each phase
    FR = (TH // 2) * COLS

    # main + halo rows, both auto-pipelined by Pallas (the manual-DMA
    # formulation paid a synchronous ~us-scale wait on every grid step --
    # measured to dominate the whole kernel at fine grids)
    X = jnp.concatenate([xm_ref[0], xh_ref[0, 0]], axis=0)
    Wt = w9_ref[0]  # (Cin, 9*CB)

    def wcol(u, v):
        t = u * 3 + v
        return Wt[:, t * CB : (t + 1) * CB]

    def view(dr, dc):
        off = dr * COLS + dc
        return X[off : off + FP, :]

    f32 = jnp.float32
    # view (0,0): tap (0,0)->P00
    D00 = jnp.dot(view(0, 0), wcol(0, 0), preferred_element_type=f32)
    # view (0,1): (0,2)->P00, (0,1)->P01
    D01 = jnp.dot(
        view(0, 1),
        jnp.concatenate([wcol(0, 2), wcol(0, 1)], axis=1),
        preferred_element_type=f32,
    )
    # view (1,0): (2,0)->P00, (1,0)->P10
    D10 = jnp.dot(
        view(1, 0),
        jnp.concatenate([wcol(2, 0), wcol(1, 0)], axis=1),
        preferred_element_type=f32,
    )
    # view (1,1): (2,2)->P00, (2,1)->P01, (1,2)->P10, (1,1)->P11
    D11 = jnp.dot(
        view(1, 1),
        jnp.concatenate([wcol(2, 2), wcol(2, 1), wcol(1, 2), wcol(1, 1)], axis=1),
        preferred_element_type=f32,
    )

    P00 = D00 + D01[:, :CB] + D10[:, :CB] + D11[:, :CB]
    P01 = D01[:, CB:] + D11[:, CB : 2 * CB]
    P10 = D10[:, CB:] + D11[:, 2 * CB : 3 * CB]
    P11 = D11[:, 3 * CB :]

    kb0, kb1, kb2, kb3 = kb

    def S(P, r):
        return P[r * COLS : r * COLS + FR + 2, :]

    # row-phase blends (out row 2i'+alpha); second index = column phase of P.
    # All flat on sublanes; the (TH2, COLS) row structure stays implicit (row
    # tails are cross-row wrap garbage, never extracted below).
    R00 = kb0 * S(P10, 0) + kb1 * S(P00, 1) + kb2 * S(P10, 1) + kb3 * S(P00, 2)
    R01 = kb0 * S(P11, 0) + kb1 * S(P01, 1) + kb2 * S(P11, 1) + kb3 * S(P01, 2)
    R10 = kb0 * S(P00, 1) + kb1 * S(P10, 1) + kb2 * S(P00, 2) + kb3 * S(P10, 2)
    R11 = kb0 * S(P01, 1) + kb1 * S(P11, 1) + kb2 * S(P01, 2) + kb3 * S(P11, 2)

    # column blends, still flat (within-row shifts 0/1/2)
    def C(R, d):
        return R[d : d + FR, :]

    O00 = kb0 * C(R01, 0) + kb1 * C(R00, 1) + kb2 * C(R01, 1) + kb3 * C(R00, 2)
    O01 = kb0 * C(R00, 1) + kb1 * C(R01, 1) + kb2 * C(R00, 2) + kb3 * C(R01, 2)
    O10 = kb0 * C(R11, 0) + kb1 * C(R10, 1) + kb2 * C(R11, 1) + kb3 * C(R10, 2)
    O11 = kb0 * C(R10, 1) + kb1 * C(R11, 1) + kb2 * C(R10, 2) + kb3 * C(R11, 2)

    # the odd-column blends start at shift 1, so their lazy sublane offset is
    # 1; Mosaic's concat/stack lowering requires matching operand layouts --
    # one scratch bounce canonicalizes each
    pair_scr[0] = O01
    pair_scr[1] = O11
    O01 = pair_scr[0][:, :]
    O11 = pair_scr[1][:, :]

    TH2 = TH // 2

    def compact(O):
        # drop the per-row COLS-W tail: (TH2*COLS, CB) -> (TH2*W, CB)
        return jnp.concatenate(
            [O[i * COLS : i * COLS + W, :] for i in range(TH2)], axis=0
        )

    A00, A01, A10, A11 = compact(O00), compact(O01), compact(O10), compact(O11)
    # column interleave (even rows / odd rows of the output), whole tile at
    # once -- sublane-side stack+reshape, which Mosaic lowers (the lane-side
    # equivalent crashes the TPU compiler)
    Z0 = jnp.stack([A00, A01], axis=1).reshape(TH2 * 2 * W, CB)
    Z1 = jnp.stack([A10, A11], axis=1).reshape(TH2 * 2 * W, CB)
    # row interleave
    Y = jnp.stack(
        [Z0.reshape(TH2, 2 * W, CB), Z1.reshape(TH2, 2 * W, CB)], axis=1
    ).reshape(TH * 2 * W, CB)

    Y = Y * demod_ref[0, 0, 0, :][None, :] + bias_ref[0, 0, :][None, :]
    Yt = Y.T  # ONE transpose per grid step: (CB, TH*2W)
    Yt = Yt + noise_ref[0, 0, :][None, :]
    if use_act:
        Yt = jnp.where(Yt >= 0.0, Yt, Yt * slope) * gain
    out_ref[0] = Yt


def convt_blur_act(
    xs: jnp.ndarray,
    weight: jnp.ndarray,
    demod: jnp.ndarray,
    noise: jnp.ndarray,
    act_bias,
    *,
    blur_kernel=(1, 3, 3, 1),
    slope: float = 0.2,
    gain: float = math.sqrt(2.0),
    use_act: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = lrelu(blur(demod * convT2x(xs, weight)) + noise + bias) * gain.

    xs: (N, Cin, H, W) style-premultiplied input; weight: (Cout, Cin, 3, 3)
    ALREADY scaled by 1/sqrt(fan_in); demod: (N, Cout); noise: (N|1, 1, 2H, 2W)
    ALREADY scaled by the layer's noise_weight; act_bias: (Cout,) or None.
    Exactly matches the XLA chain in `nn/blocks.py` (modulated upsample path +
    noise + fused_leaky_relu) up to bf16 matmul rounding -- the same precision
    class as XLA's default f32 conv lowering on TPU.  Forward only (no VJP).
    """
    N, Cin, H, W = xs.shape
    Cout = weight.shape[0]
    assert weight.shape == (Cout, Cin, 3, 3), weight.shape
    assert len(blur_kernel) == 4, "fused kernel supports 4-tap separable blur only"

    # Mosaic DMA requires the minor (channel) dim of the HBM operand be
    # 128-aligned; true for every fused-eligible generator layer (Cin in
    # {128, 256, 512}), not for toy shapes -- fall back to the XLA chain
    # there (interpret mode has no such constraint, keep it for CPU tests)
    if not interpret and Cin % 128 != 0:
        return convt_blur_act_ref(
            xs, weight, demod, noise, act_bias,
            blur_kernel=blur_kernel, slope=slope, gain=gain, use_act=use_act,
        )

    kbv = np.asarray(blur_kernel, np.float64)
    kbv = kbv / kbv.sum() * 2.0  # per-axis gain 2 (total upsample gain 4)
    kb = tuple(float(v) for v in kbv[::-1])  # correlation taps = flipped

    TH = min(16, 2 * H)  # output row-tile; divides 2H for all pow2 sizes
    CB = min(128, Cout)
    assert (2 * H) % TH == 0 and Cout % CB == 0
    RT = (2 * H) // TH
    CO = Cout // CB
    # pad the flat row pitch to a sublane-tile multiple: every r*COLS slice
    # (row blends, per-row extraction) is then 8-aligned, which Mosaic's
    # concat/stack lowering requires (offset-mismatch errors otherwise)
    COLS = ((W + 3 + 7) // 8) * 8

    # NHWC-flat input: the transpose fuses into the style-multiply pass that
    # materializes xs anyway (copy with layout change + fused producer).
    # Rows padded (2, 2): the extra bottom zero row completes the last tile's
    # 4-row halo block (only ever read into discarded slack positions).
    x_pp = jnp.pad(xs, ((0, 0), (0, 0), (2, 2), (2, 1 + COLS - (W + 3))))
    xf = x_pp.transpose(0, 2, 3, 1).reshape(N, (H + 4) * COLS, Cin)
    xf = xf.astype(jnp.bfloat16)
    TH2 = TH // 2
    # halo: 4 rows below each tile's main rows, gathered once host^W XLA-side
    # (tiny: 4*RT rows vs H+4 total)
    xh = jnp.stack(
        [xf[:, (rt + 1) * TH2 * COLS : ((rt + 1) * TH2 + 4) * COLS, :] for rt in range(RT)],
        axis=1,
    )  # (N, RT, 4*COLS, Cin)

    wt = jnp.flip(weight, (2, 3))  # correlation kernel (Cout, Cin, 3, 3)
    w9 = wt.transpose(2, 3, 0, 1).reshape(9, CO, CB, Cin)
    w9 = w9.transpose(1, 3, 0, 2).reshape(CO, Cin, 9 * CB).astype(jnp.bfloat16)

    nb = noise.shape[0]
    assert noise.shape in ((N, 1, 2 * H, 2 * W), (1, 1, 2 * H, 2 * W)), noise.shape
    if act_bias is None:
        act_bias = jnp.zeros((Cout,), jnp.float32)

    kernel = functools.partial(
        _kernel,
        CB=CB, COLS=COLS, W=W, TH=TH, kb=kb,
        slope=float(slope), gain=float(gain), use_act=use_act,
    )

    return pl.pallas_call(
        kernel,
        grid=(N, RT, CO),
        in_specs=[
            pl.BlockSpec((1, TH2 * COLS, Cin), lambda n, rt, co: (n, rt, 0)),
            pl.BlockSpec((1, 1, 4 * COLS, Cin), lambda n, rt, co: (n, rt, 0, 0)),
            pl.BlockSpec((1, Cin, 9 * CB), lambda n, rt, co: (co, 0, 0)),
            # (1,1,1,CB)/(CO,1,CB) shapes: Mosaic requires the last two block
            # dims be (8,128)-divisible OR equal to the array dims
            pl.BlockSpec((1, 1, 1, CB), lambda n, rt, co: (n, co, 0, 0)),
            pl.BlockSpec(
                (1, 1, TH * 2 * W),
                (lambda n, rt, co: (n, 0, rt)) if nb != 1 else (lambda n, rt, co: (0, 0, rt)),
            ),
            pl.BlockSpec((1, 1, CB), lambda n, rt, co: (co, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, CB, TH * 2 * W), lambda n, rt, co: (n, co, rt)),
        out_shape=jax.ShapeDtypeStruct((N, Cout, 4 * H * W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, TH2 * COLS, CB), jnp.float32),
        ],
        interpret=interpret,
    )(
        xf,
        xh,
        w9,
        demod.astype(jnp.float32).reshape(N, CO, 1, CB),
        noise.astype(jnp.float32).reshape(nb, 1, 4 * H * W),
        jnp.asarray(act_bias, jnp.float32).reshape(CO, 1, CB),
    ).reshape(N, Cout, 2 * H, 2 * W)


def convt_blur_act_ref(
    xs, weight, demod, noise, act_bias, *,
    blur_kernel=(1, 3, 3, 1), slope=0.2, gain=math.sqrt(2.0), use_act=True,
):
    """XLA chain oracle with identical semantics (for parity tests)."""
    from rick_tpu.ops.resample import blur as blur_op

    kh = weight.shape[2]
    wt = jnp.flip(weight, (2, 3))
    out = lax.conv_general_dilated(
        xs, wt, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = out * demod[:, :, None, None]
    p = (len(blur_kernel) - 2) - (kh - 1)
    pad0 = (p + 1) // 2 + 1
    pad1 = p // 2 + 1
    out = blur_op(out, jnp.asarray(blur_kernel, jnp.float32), pad=(pad0, pad1), upsample_factor=2)
    out = out + noise
    if act_bias is not None:
        out = out + jnp.asarray(act_bias).reshape(1, -1, 1, 1)
    if use_act:
        out = jnp.where(out >= 0, out, out * slope) * gain
    return out
