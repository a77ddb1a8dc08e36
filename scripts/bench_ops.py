"""Op-level microbenchmarks on the real TPU (VERDICT r2 #5: convT+blur fusion).

Measures the generator's upsample-path ops (convT 3x3 stride-2 -> 4-tap FIR
blur, reference `model_probe_tune.py:257-268`) under several lowerings:

  blur variants (per-channel FIR):
    sep      -- two 1-D separable passes (round-2 default)
    2d_group -- one 2-D 4x4 pass, feature_group_count=C depthwise
    2d_batch -- one 2-D 4x4 pass, batch-collapse reshape (N*C,1,H,W)

  convT+blur variants (the fusion target):
    chain    -- conv_transpose2x then blur (round-2 default)
    composed -- ONE dilated conv with the pre-composed 6x6 kernel
                (blur ** convT kernel composed at trace time; the blur's HBM
                round trip disappears, at 4x the convT MACs)

All timings use a dispatch-free in-jit fori_loop and sync by fetching a VALUE
(block_until_ready lies on this backend -- see CLAUDE.md).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rick_tpu.ops.resample import blur, make_kernel, upfirdn2d_general

BLUR_1D = (1.0, 3.0, 3.0, 1.0)


def bench(fn, x, n=10, reps=3, touch_only=False):
    """ms/call: n in-jit calls per dispatch, best of reps (value-synced).

    touch_only=True reads a single element instead of summing -- ONLY valid
    for opaque calls (Pallas) that XLA cannot partially DCE.  For fusible XLA
    graphs the full sum is required (a one-element read lets XLA slice the
    computation down to a 4x4 window), but it is free there (fuses into the
    epilogue); after a Pallas call the sum would cost an extra full HBM read.
    """

    @jax.jit
    def run(x):
        def body(i, acc):
            y = fn(x * (1.0 + 1e-12 * i.astype(x.dtype)))
            if touch_only:
                return acc + y[0, 0, 0, 0].astype(jnp.float32)
            return acc + jnp.sum(y).astype(jnp.float32)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(x))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(run(x))
        best = min(best, (time.time() - t0) / n)
    return best * 1000.0


# ---------------------------------------------------------------------------
# blur variants
# ---------------------------------------------------------------------------


def blur_sep(x):
    return blur(x, BLUR_1D, pad=(1, 1), upsample_factor=2)


def _blur2d_kernel():
    k = make_kernel(jnp.asarray(BLUR_1D)) * 4.0  # upsample gain
    return jnp.flip(k, (0, 1))


def blur_2d_group(x):
    kflip = _blur2d_kernel().astype(x.dtype)
    c = x.shape[1]
    w = jnp.broadcast_to(kflip[None, None], (c, 1, 4, 4))
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        feature_group_count=c, dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def blur_2d_batch(x):
    kflip = _blur2d_kernel().astype(x.dtype)
    n, c, h, w_ = x.shape
    y = lax.conv_general_dilated(
        x.reshape(n * c, 1, h, w_), kflip[None, None], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y.reshape(n, c, h - 1, w_ - 1)


# ---------------------------------------------------------------------------
# convT(3x3, stride 2) + blur variants.  Weight layout (out,in,3,3).
# ---------------------------------------------------------------------------


def convt_chain(x, w):
    in_ch, out_ch = w.shape[1], w.shape[0]
    wt = jnp.flip(w, (2, 3))
    out = lax.conv_general_dilated(
        x, wt, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return blur_sep(out)


def compose_convt_blur_kernel(w):
    """6x6 correlation kernel equal to (4-tap blur) o (convT 3x3 stride 2).

    Both stages are lax correlations; their composition is the correlation
    with full_conv(wt, kblur_corr) = corr(wt, flip(kblur_corr)) at full pad.
    """
    o, i, kh, kw = w.shape
    wt = jnp.flip(w, (2, 3))  # convT's correlation kernel
    kb = _blur2d_kernel()  # blur's correlation kernel (already flipped)
    comp = lax.conv_general_dilated(
        wt.reshape(o * i, 1, kh, kw),
        jnp.flip(kb, (0, 1))[None, None].astype(w.dtype),
        (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return comp.reshape(o, i, kh + 3, kw + 3)


def convt_composed(x, w):
    comp = compose_convt_blur_kernel(w)
    return lax.conv_general_dilated(
        x, comp, (1, 1), ((3, 3), (3, 3)), lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def main():
    print(f"backend: {jax.default_backend()}")
    key = jax.random.key(0)

    # parity check (CPU-cheap sizes) before timing anything; highest matmul
    # precision so the check is not polluted by the default bf16 MXU passes
    xs = jax.random.normal(key, (2, 8, 16, 16))
    ws = jax.random.normal(jax.random.key(1), (4, 8, 3, 3)) * 0.1
    with jax.default_matmul_precision("highest"):
        a = convt_chain(xs, ws)
        b = convt_composed(xs, ws)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-12))
    print(f"composed-vs-chain rel err: {err:.2e}  shapes {a.shape} {b.shape}")
    assert a.shape == b.shape and err < 1e-5
    with jax.default_matmul_precision("highest"):
        d = blur_sep(xs)
        c = blur_2d_group(xs)
        e = blur_2d_batch(xs)
    err_c = float(jnp.max(jnp.abs(c - d)))
    err_e = float(jnp.max(jnp.abs(e - d)))
    print(f"blur 2d_group vs sep: {err_c:.2e}   2d_batch vs sep: {err_e:.2e}")
    assert err_c < 1e-4 and err_e < 1e-4

    # eval-relevant blur shapes (batch 100 = eval gen chunk), NCHW f32
    blur_shapes = [
        (100, 128, 257, 257),  # 256px layer (the ROUND2 roofline row)
        (100, 256, 129, 129),  # 128px layer
        (100, 512, 65, 65),    # 64px layer
        (2, 128, 257, 257),    # train batch
    ]
    print("\nblur variants (ms/call):")
    print(f"{'shape':>24} {'sep':>8} {'2d_group':>9} {'2d_batch':>9}")
    for shp in blur_shapes:
        x = jax.random.normal(key, shp)
        t_sep = bench(blur_sep, x)
        t_g = bench(blur_2d_group, x)
        t_b = bench(blur_2d_batch, x)
        print(f"{str(shp):>24} {t_sep:8.2f} {t_g:9.2f} {t_b:9.2f}")
        del x

    # convT+blur layer shapes: (in_ch, out_ch, in_px) of the 256px generator
    from rick_tpu.ops.fused_upsample import convt_blur_act, convt_blur_act_ref

    layer_shapes = [
        (512, 512, 4), (512, 512, 8), (512, 512, 16), (512, 512, 32),
        (512, 256, 64), (256, 128, 128),
    ]
    print("\nconvT3x3s2 + blur4 [+demod+noise+bias+lrelu for fused/chain+ep]")
    print("(ms/call, batch 100):")
    print(f"{'layer':>22} {'chain':>8} {'composed':>9} {'chain+ep':>9} {'fused':>8}")
    for in_ch, out_ch, px in layer_shapes:
        x = jax.random.normal(key, (100, in_ch, px, px))
        w = jax.random.normal(jax.random.key(2), (out_ch, in_ch, 3, 3)) * 0.05
        demod = jax.random.uniform(jax.random.key(3), (100, out_ch), minval=0.5, maxval=1.5)
        noise = jax.random.normal(jax.random.key(4), (100, 1, 2 * px, 2 * px)) * 0.1
        bias = jax.random.normal(jax.random.key(5), (out_ch,)) * 0.1

        # parity on real hardware first (default precision: bf16-class tol)
        a = convt_blur_act_ref(x[:2], w, demod[:2], noise[:2], bias)
        b = convt_blur_act(x[:2], w, demod[:2], noise[:2], bias)
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
        assert err < 2e-2, (in_ch, out_ch, px, err)

        t_chain = bench(lambda v: convt_chain(v, w), x, n=6)
        t_comp = bench(lambda v: convt_composed(v, w), x, n=6)
        t_chep = bench(
            lambda v: convt_blur_act_ref(v, w, demod, noise, bias), x, n=6
        )
        t_fused = bench(
            lambda v: convt_blur_act(v, w, demod, noise, bias), x, n=6, touch_only=True
        )
        print(
            f"{in_ch:>6}->{out_ch:<4} @{px:>4}px {t_chain:8.2f} {t_comp:9.2f}"
            f" {t_chep:9.2f} {t_fused:8.2f}   (par {err:.1e})"
        )
        del x


if __name__ == "__main__":
    main()
