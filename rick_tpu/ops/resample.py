"""upfirdn2d: upsample -> FIR filter -> downsample, the StyleGAN2 resampling primitive.

Reference semantics: `/root/reference/op/upfirdn2d.py:159-200` (`upfirdn2d_native`,
the executable spec of the CUDA kernel at `op/upfirdn2d_kernel.cu:107-207`):

    1. zero-insertion upsample by (up_y, up_x)
    2. pad spatially by (pad_y0, pad_y1, pad_x0, pad_x1)  (negative pad = crop)
    3. 2-D convolution with `kernel` (i.e. correlation with the flipped kernel)
    4. stride-downsample by (down_y, down_x)

    out_h = (in_h * up_y + pad_y0 + pad_y1 - kernel_h) // down_y + 1

TPU-native design: the whole chain is ONE `lax.conv_general_dilated` call --
`lhs_dilation` performs the zero-insertion upsample, conv `padding` accepts
negative values (so the crop case needs no slicing), and `window_strides`
performs the downsample.  XLA lowers this to the MXU/VPU and, critically, its
gradient is again a dilated conv, so arbitrary-order autodiff works without
the reference's hand-written UpFirDn2dBackward (`op/upfirdn2d.py:19-85`).

Filters are tiny (3x3..12x12 separable), the op is HBM-bandwidth bound; XLA's
fused conv is already near speed-of-light for this shape class (measured at
the HBM roofline, ROUND2.md op table), so no standalone Pallas variant is
kept; Pallas fusion experiments live in `ops/pallas_kernels.py`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_kernel(k) -> jnp.ndarray:
    """Normalized 2-D FIR kernel from a 1-D or 2-D spec.

    Mirror of `gan_training/models/model_probe_tune.py:29-37`: 1-D kernels are
    outer-producted with themselves, then normalized to sum to 1.
    """
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = jnp.outer(k, k)
    k = k / jnp.sum(k)
    return k


def upfirdn2d_general(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up_x: int = 1,
    up_y: int = 1,
    down_x: int = 1,
    down_y: int = 1,
    pad_x0: int = 0,
    pad_x1: int = 0,
    pad_y0: int = 0,
    pad_y1: int = 0,
) -> jnp.ndarray:
    """General per-axis upfirdn2d on NCHW input. All factors/pads are static ints."""
    n, c, in_h, in_w = x.shape
    kh, kw = kernel.shape

    out_h = (in_h * up_y + pad_y0 + pad_y1 - kh) // down_y + 1
    out_w = (in_w * up_x + pad_x0 + pad_x1 - kw) // down_x + 1
    if out_h <= 0 or out_w <= 0:
        raise ValueError(
            f"upfirdn2d output would be empty: in=({in_h},{in_w}) up=({up_y},{up_x}) "
            f"down=({down_y},{down_x}) pad=({pad_y0},{pad_y1},{pad_x0},{pad_x1}) k=({kh},{kw})"
        )

    # lax conv computes correlation; flipping the kernel yields true
    # convolution, matching the reference (conv2d with flipped kernel,
    # upfirdn2d.py:186-187).  lhs_dilation produces (n-1)*up+1 samples;
    # upfirdn's zero-insertion produces n*up (with up-1 trailing zeros), so
    # those trailing zeros fold into the high padding.
    kflip = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    padding = ((pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1))

    # Two equivalent lowerings (both covered by the oracle tests):
    #  * batch-collapse reshape: fastest backward on TPU, but the reshape
    #    materializes a full activation copy -- prohibitive for huge
    #    activations (8 GB at eval batch 250 x 128ch x 256^2);
    #  * feature_group_count depthwise: no copy, slightly slower grads.
    if n * c * in_h * in_w <= (1 << 27):
        xr = x.reshape(n * c, 1, in_h, in_w)
        y = lax.conv_general_dilated(
            xr,
            kflip[None, None],
            window_strides=(down_y, down_x),
            padding=padding,
            lhs_dilation=(up_y, up_x),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return y.reshape(n, c, out_h, out_w)

    w = jnp.broadcast_to(kflip[None, None], (c, 1, kh, kw))
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(down_y, down_x),
        padding=padding,
        lhs_dilation=(up_y, up_x),
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def upfirdn2d(x, kernel, up: int = 1, down: int = 1, pad=(0, 0)) -> jnp.ndarray:
    """Public API, mirroring the reference dispatch (`op/upfirdn2d.py:145-156`)."""
    return upfirdn2d_general(
        x, kernel, up, up, down, down, pad[0], pad[1], pad[0], pad[1]
    )


def upfirdn2d_separable(x, k1d, up: int = 1, down: int = 1, pad=(0, 0)) -> jnp.ndarray:
    """upfirdn2d with a rank-1 kernel outer(k1d, k1d), as two 1-D passes.

    Exactly equal to `upfirdn2d(x, outer(k1d, k1d), ...)` (the 2-D zero-insert /
    pad / convolve / stride factorizes per axis for separable kernels) at
    2K taps instead of K^2 -- all StyleGAN2 blur kernels and the ADA sym6
    wavelet are separable."""
    k = jnp.asarray(k1d, jnp.float32)
    x = upfirdn2d_general(x, k[:, None], 1, up, 1, down, 0, 0, pad[0], pad[1])
    return upfirdn2d_general(x, k[None, :], up, 1, down, 1, pad[0], pad[1], 0, 0)


def _norm_1d(kernel) -> Optional[jnp.ndarray]:
    """Normalized 1-D kernel if the spec is 1-D (the separable fast path);
    None for explicit 2-D kernels."""
    k = jnp.asarray(kernel, dtype=jnp.float32)
    if k.ndim != 1:
        return None
    return k / jnp.sum(k)


def upsample2d(x, kernel, factor: int = 2) -> jnp.ndarray:
    """Antialiased 2x (or `factor`x) upsample, mirror of `Upsample`
    (`model_probe_tune.py:40-58`): kernel gain factor**2, pad so out = in*factor.
    1-D kernel specs take the separable two-pass path (2K taps vs K^2)."""
    k1 = _norm_1d(kernel)
    if k1 is not None:
        p = k1.shape[0] - factor
        pad0 = (p + 1) // 2 + factor - 1
        pad1 = p // 2
        return upfirdn2d_separable(x, k1 * factor, up=factor, down=1, pad=(pad0, pad1))
    kernel = make_kernel(kernel) * (factor**2)
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=factor, down=1, pad=(pad0, pad1))


def downsample2d(x, kernel, factor: int = 2) -> jnp.ndarray:
    """Antialiased downsample, mirror of `Downsample` (`model_probe_tune.py:61-79`)."""
    k1 = _norm_1d(kernel)
    if k1 is not None:
        p = k1.shape[0] - factor
        pad0 = (p + 1) // 2
        pad1 = p // 2
        return upfirdn2d_separable(x, k1, up=1, down=factor, pad=(pad0, pad1))
    kernel = make_kernel(kernel)
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))


def blur(x, kernel, pad, upsample_factor: int = 1) -> jnp.ndarray:
    """FIR blur, mirror of `Blur` (`model_probe_tune.py:82-98`).

    `kernel` is the raw 1-D/2-D spec; gain is upsample_factor**2 when the blur
    follows a transposed conv.

    Lowering is shape-dependent (both measured on v5e, scripts/bench_ops.py +
    bench_blur_ab.py): for LARGE activations (eval-scale, HBM-bandwidth bound)
    ONE 2-D depthwise pass wins 24-28% over the separable two-pass
    formulation, whose second read+write of the activation buys FLOPs that
    were never the bottleneck; for small activations (train batch 2) the
    separable path keeps a ~4% faster full train iteration (better backward).
    RICK_BLUR=sep / RICK_BLUR=2d force one lowering for A/B."""
    import os

    k1 = _norm_1d(kernel)
    mode = os.environ.get("RICK_BLUR")
    if mode is None:
        mode = "2d" if x.size > (1 << 27) else "sep"
    if k1 is not None and mode == "sep":
        return upfirdn2d_separable(x, k1 * upsample_factor, pad=pad)
    kernel = make_kernel(kernel)
    if upsample_factor > 1:
        kernel = kernel * (upsample_factor**2)
    return upfirdn2d(x, kernel, pad=pad)


def upfirdn2d_numpy_oracle(
    x: np.ndarray,
    kernel: np.ndarray,
    up_x=1,
    up_y=1,
    down_x=1,
    down_y=1,
    pad_x0=0,
    pad_x1=0,
    pad_y0=0,
    pad_y1=0,
) -> np.ndarray:
    """Slow, direct numpy implementation used as the test oracle.

    Written from the upfirdn definition (zero-insert, pad, convolve, stride),
    independent of both the reference code and the lax formulation.
    """
    from scipy.signal import convolve2d

    n, c, in_h, in_w = x.shape
    kh, kw = kernel.shape
    out_h = (in_h * up_y + pad_y0 + pad_y1 - kh) // down_y + 1
    out_w = (in_w * up_x + pad_x0 + pad_x1 - kw) // down_x + 1
    out = np.zeros((n, c, out_h, out_w), dtype=np.float64)
    for b in range(n):
        for ch in range(c):
            upimg = np.zeros((in_h * up_y, in_w * up_x), dtype=np.float64)
            upimg[::up_y, ::up_x] = x[b, ch]
            padded = np.zeros(
                (in_h * up_y + pad_y0 + pad_y1, in_w * up_x + pad_x0 + pad_x1),
                dtype=np.float64,
            )
            # positive pad: offset; negative pad: crop the source region
            src_y0 = max(-pad_y0, 0)
            src_x0 = max(-pad_x0, 0)
            src_y1 = upimg.shape[0] - max(-pad_y1, 0)
            src_x1 = upimg.shape[1] - max(-pad_x1, 0)
            dst_y0 = max(pad_y0, 0)
            dst_x0 = max(pad_x0, 0)
            region = upimg[src_y0:src_y1, src_x0:src_x1]
            padded[dst_y0 : dst_y0 + region.shape[0], dst_x0 : dst_x0 + region.shape[1]] = region
            # true 2-D convolution with `kernel` (scipy flips internally)
            conv = convolve2d(padded, kernel.astype(np.float64), mode="valid")
            out[b, ch] = conv[::down_y, ::down_x]
    return out
