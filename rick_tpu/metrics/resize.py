"""torch-convention image resizes for metric-extractor parity.

The reference's metric wrappers resize with `F.interpolate`:
  * FID: bilinear to 299, align_corners=False, NO antialias
    (`gan_training/metrics/inception.py:90` via F.upsample)
  * P&R: default NEAREST to 224 (`gan_metrics/precision_recall.py:137`)

`jax.image.resize` follows different conventions (nearest rounds half-pixel
centers; bilinear ANTIALIASES on downsample), so FID at 512/1024px and every
P&R run would silently deviate from the reference.  These helpers replicate
torch's exact index math; the bilinear path is expressed as two small matmuls
(separable row/col interpolation matrices, built in numpy at trace time), the
TPU-friendly formulation of a gather.

Parity with torch is asserted activation-for-activation in
tests/test_metrics_oracle.py.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) interpolation matrix matching torch upsample_bilinear2d with
    align_corners=False: src = max(scale*(dst+0.5)-0.5, 0); 2 taps, the second
    clamped at the right edge."""
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = np.maximum(scale * (dst + 0.5) - 0.5, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    lam = src - i0
    i1 = np.minimum(i0 + 1, in_size - 1)
    mat = np.zeros((out_size, in_size), np.float64)
    mat[np.arange(out_size), i0] += 1.0 - lam
    mat[np.arange(out_size), i1] += lam
    return mat  # f64; cast to the compute dtype at the use site


@functools.lru_cache(maxsize=None)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """torch F.interpolate mode='nearest' source indices:
    min(floor(dst * in/out), in-1) (the asymmetric legacy convention)."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size, dtype=np.float64) * scale).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def bilinear_resize_torch(x, out_h: int, out_w: int, *, nhwc: bool = False):
    """F.interpolate(x, (out_h, out_w), mode='bilinear', align_corners=False),
    exactly (no antialias on downsample).  x: (N, C, H, W) or NHWC."""
    h_ax, w_ax = (1, 2) if nhwc else (2, 3)
    if x.shape[h_ax] == out_h and x.shape[w_ax] == out_w:
        return x
    rmat = jnp.asarray(_bilinear_matrix(x.shape[h_ax], out_h), x.dtype)
    cmat = jnp.asarray(_bilinear_matrix(x.shape[w_ax], out_w), x.dtype)
    if nhwc:
        x = jnp.einsum("oh,nhwc->nowc", rmat, x)
        return jnp.einsum("pw,nowc->nopc", cmat, x)
    x = jnp.einsum("oh,nchw->ncow", rmat, x)
    return jnp.einsum("pw,ncow->ncop", cmat, x)


def nearest_resize_torch(x, out_h: int, out_w: int, *, nhwc: bool = False):
    """F.interpolate(x, (out_h, out_w)) with the default legacy 'nearest'
    mode, exactly.  Pure gather by precomputed static indices."""
    h_ax, w_ax = (1, 2) if nhwc else (2, 3)
    if x.shape[h_ax] == out_h and x.shape[w_ax] == out_w:
        return x
    ri = jnp.asarray(_nearest_indices(x.shape[h_ax], out_h))
    ci = jnp.asarray(_nearest_indices(x.shape[w_ax], out_w))
    x = jnp.take(x, ri, axis=h_ax)
    return jnp.take(x, ci, axis=w_ax)
