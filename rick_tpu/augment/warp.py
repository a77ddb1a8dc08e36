"""TPU-native bilinear warp as 2-tap interpolation MATMULS (no point gathers).

The ADA affine warp (`non_leaking.py:355-357`, `grid_sample`) is a bilinear
sample of each image at an affine-transformed grid.  Expressed naively that is
a 4-point 2-D gather per output pixel, and its VJP is a scatter-add -- both
TPU-hostile (ROUND1: the warp gather dominated the training step).

Bilinear interpolation factors EXACTLY through one-axis selections:

    out[p] = sum_r Lrow[p, r] * (sum_w F[r, w] * Lcol[p, w])

where Lrow has the two row taps ((1-wy) at y0, wy at y0+1) and Lcol the two
column taps of output point p.  Stage 1 (row select+blend) is a plain matmul
`Lrow @ F` -- MXU work; stage 2 is an elementwise multiply-reduce.  The VJP is
`Lrow^T @ (...)`: the scatter becomes a matmul TRANSPOSE, so plain autodiff
yields an MXU backward with no custom VJP.

To keep the operands small the output grid is processed in TILE x TILE blocks:
an affine map sends a tile into a bounded input footprint (extent <=
(|a|+|b|) * TILE + 2 per axis), which is dynamic-sliced out of the source
image at a per-tile computed offset.  The static footprint covers combined
scale factors up to SCALE_MAX * sqrt(2); beyond that (deep distribution tails)
taps clamp to the footprint edge -- same graceful-degradation contract as the
static reflection margin.

Numerics are bit-identical to the gather formulation (`tests/test_augment.py`
asserts exact agreement): the tap indices and weights are computed with the
same floor/clip arithmetic, and when both taps clip to the same pixel the two
one-hot terms add to the same total weight.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _reflect_coord(pix, size):
    """Fold a continuous pixel coordinate into [-0.5, size-0.5) by mirror
    reflection about the image edges (grid_sample 'reflection',
    align_corners=False convention).  Identical to the gather sampler's fold."""
    period = 2.0 * size
    t = jnp.mod(pix + 0.5, period)
    t = jnp.where(t < 0, t + period, t)
    t = jnp.where(t >= size, period - t - 1e-6, t)
    return t - 0.5


def _tap_matrix(coord, start, n_local, n_global):
    """(P,) folded continuous coords -> (P, n_local) 2-tap interpolation matrix
    relative to a footprint starting at `start` (int scalar).

    Tap arithmetic mirrors `_bilinear_sample_reflect`: t0 = floor(c) clipped to
    [0, n_global-1], t1 = t0_clipped + 1 clipped, weight w = c - floor(c)
    (UNclipped floor).  Both taps are then made footprint-local; the final clip
    to [0, n_local-1] only fires for beyond-footprint tails."""
    c0 = jnp.floor(coord)
    w = coord - c0
    t0 = jnp.clip(c0.astype(jnp.int32), 0, n_global - 1)
    t1 = jnp.clip(t0 + 1, 0, n_global - 1)
    l0 = jnp.clip(t0 - start, 0, n_local - 1)
    l1 = jnp.clip(t1 - start, 0, n_local - 1)
    iota = jnp.arange(n_local, dtype=jnp.int32)
    m0 = (iota[None, :] == l0[:, None]).astype(coord.dtype) * (1.0 - w)[:, None]
    m1 = (iota[None, :] == l1[:, None]).astype(coord.dtype) * w[:, None]
    return m0 + m1


def _default_tile() -> int:
    import os

    return int(os.environ.get("RICK_ADA_WARP_TILE", "32"))


def warp_bilinear_matmul(img, x_pix, y_pix, *, tile: int | None = None, scale_max: float = 2.0):
    """Bilinear-sample img (B, C, H, W) at continuous pixel coords
    x_pix/y_pix (B, Lh, Lw), reflecting out-of-range coordinates.  Exact
    equivalent of `vmap(_bilinear_sample_reflect)`, restructured as tiled
    interpolation matmuls.
    """
    B, C, H, W = img.shape
    _, Lh, Lw = x_pix.shape
    T = tile if tile is not None else _default_tile()

    x = _reflect_coord(x_pix, W)
    y = _reflect_coord(y_pix, H)

    # static footprint: affine tile extent bound + floor/ceil slack
    ext = int(math.ceil(T * math.sqrt(2.0) * scale_max)) + 4
    FR = min(ext, H)
    FC = min(ext, W)

    nh = -(-Lh // T)
    nw = -(-Lw // T)
    pad_h, pad_w = nh * T - Lh, nw * T - Lw
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w)), mode="edge")
        y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w)), mode="edge")

    # (B, nt, P) tiled coords
    def tiles(a):
        a = a.reshape(B, nh, T, nw, T).transpose(0, 1, 3, 2, 4)
        return a.reshape(B, nh * nw, T * T)

    xt, yt = tiles(x), tiles(y)

    # per-tile footprint offsets (traced), clamped so the slice stays in range
    ry = jnp.clip(jnp.floor(yt.min(axis=-1)).astype(jnp.int32), 0, H - FR)
    cx = jnp.clip(jnp.floor(xt.min(axis=-1)).astype(jnp.int32), 0, W - FC)

    def slice_one(im, r, c):
        return jax.lax.dynamic_slice(im, (0, r, c), (C, FR, FC))

    # F: (B, nt, C, FR, FC)
    F = jax.vmap(lambda im, rs, cs: jax.vmap(slice_one, in_axes=(None, 0, 0))(im, rs, cs))(
        img, ry, cx
    )

    row_m = jax.vmap(jax.vmap(_tap_matrix, in_axes=(0, 0, None, None)),
                     in_axes=(0, 0, None, None))(yt, ry, FR, H)  # (B, nt, P, FR)
    col_m = jax.vmap(jax.vmap(_tap_matrix, in_axes=(0, 0, None, None)),
                     in_axes=(0, 0, None, None))(xt, cx, FC, W)  # (B, nt, P, FC)

    # stage 1 (MXU): row select+blend for every footprint column
    rsel = jnp.einsum("btpr,btcrw->btcpw", row_m, F)
    # stage 2: column taps, multiply-reduce
    out = jnp.einsum("btpw,btcpw->btcp", col_m, rsel)

    out = out.reshape(B, nh, nw, C, T, T).transpose(0, 3, 1, 4, 2, 5)
    out = out.reshape(B, C, nh * T, nw * T)
    return out[:, :, :Lh, :Lw]
