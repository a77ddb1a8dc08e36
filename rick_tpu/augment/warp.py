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


# ---------------------------------------------------------------------------
# up2-FIR folded into the warp matrices (VERDICT r2 #6)
# ---------------------------------------------------------------------------

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _up2_matrix(n_in: int, kernel_bytes: bytes) -> np.ndarray:
    """(n_out, n_in) band matrix of the 1-D up2-FIR (zero-insert by 2, true
    convolution with the K-tap kernel, 'valid'):  U[r, j] = k[r + K - 1 - 2j].
    Pure numpy (must be buildable at trace time); verified element-for-element
    against the production `upfirdn2d_general` in tests."""
    k = np.frombuffer(kernel_bytes, np.float32)
    K = k.shape[0]
    r = np.arange(2 * n_in - K + 1)[:, None]
    j = np.arange(n_in)[None, :]
    idx = r + K - 1 - 2 * j
    return np.where(
        (idx >= 0) & (idx < K), k[np.clip(idx, 0, K - 1)], 0.0
    ).astype(np.float32)


def warp_bilinear_matmul_fir(
    img_pad, x_pix, y_pix, k_up_1d, *, tile: int | None = None, scale_max: float = 2.0
):
    """`warp_bilinear_matmul(up2_fir(img_pad), x, y)` with the FIR FOLDED into
    the interpolation matrices (equal up to fp reassociation; tested).

    The ADA chain up2-FIR -> bilinear warp is linear per axis: the warp's
    2-tap row/col matrices (in 2x space) compose with the up2-FIR band matrix
    U into ~(2+12)-tap matrices over the PADDED image directly.  The 2x
    intermediate is never materialized and the per-tile footprints sliced
    from memory shrink 4x (half per axis) -- the matmuls stay tiny vs the
    MXU.  x_pix/y_pix remain coordinates in the (virtual) 2x grid.
    Reference chain being folded: `non_leaking.py:338-359`.
    """
    B, C, Hp, Wp = img_pad.shape
    _, Lh, Lw = x_pix.shape
    T = tile if tile is not None else _default_tile()
    k_np = np.asarray(k_up_1d, np.float32)
    K = k_np.shape[0]
    H2 = 2 * Hp - (K - 1)
    W2 = 2 * Wp - (K - 1)

    U_r = jnp.asarray(_up2_matrix(Hp, k_np.tobytes()))  # (H2, Hp)
    U_c = jnp.asarray(_up2_matrix(Wp, k_np.tobytes()))  # (W2, Wp)

    x = _reflect_coord(x_pix, W2)
    y = _reflect_coord(y_pix, H2)

    # 2x-space footprint extent (as in warp_bilinear_matmul) and the padded-
    # space footprint it maps to.  U's band (measured off the production op):
    # 2x row r draws padded rows [(r+1)//2, (r+1)//2 + K//2 - 1], so rows
    # [r, r+FR) span at most FR//2 + K//2 + 1 padded rows.
    ext = int(math.ceil(T * math.sqrt(2.0) * scale_max)) + 4
    FR = min(ext, H2)
    FC = min(ext, W2)
    FRp = min(FR // 2 + K // 2 + 1, Hp)
    FCp = min(FC // 2 + K // 2 + 1, Wp)

    nh = -(-Lh // T)
    nw = -(-Lw // T)
    pad_h, pad_w = nh * T - Lh, nw * T - Lw
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w)), mode="edge")
        y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w)), mode="edge")

    def tiles(a):
        a = a.reshape(B, nh, T, nw, T).transpose(0, 1, 3, 2, 4)
        return a.reshape(B, nh * nw, T * T)

    xt, yt = tiles(x), tiles(y)

    # per-tile 2x-space offsets and their padded-space counterparts
    ry = jnp.clip(jnp.floor(yt.min(axis=-1)).astype(jnp.int32), 0, H2 - FR)
    cx = jnp.clip(jnp.floor(xt.min(axis=-1)).astype(jnp.int32), 0, W2 - FC)
    rp = jnp.clip((ry + 1) // 2, 0, Hp - FRp)
    cp = jnp.clip((cx + 1) // 2, 0, Wp - FCp)

    def slice_img(im, r, c):
        return jax.lax.dynamic_slice(im, (0, r, c), (C, FRp, FCp))

    Fp = jax.vmap(
        lambda im, rs, cs: jax.vmap(slice_img, in_axes=(None, 0, 0))(im, rs, cs)
    )(img_pad, rp, cp)  # (B, nt, C, FRp, FCp)

    # 2-tap matrices in 2x space, footprint-local
    row2 = jax.vmap(jax.vmap(_tap_matrix, in_axes=(0, 0, None, None)),
                    in_axes=(0, 0, None, None))(yt, ry, FR, H2)  # (B,nt,P,FR)
    col2 = jax.vmap(jax.vmap(_tap_matrix, in_axes=(0, 0, None, None)),
                    in_axes=(0, 0, None, None))(xt, cx, FC, W2)  # (B,nt,P,FC)

    # compose with the up2-FIR band: local U slice (FR, FRp) at (ry, rp)
    def u_slice(U, r2, rpad, fr, frp):
        return jax.lax.dynamic_slice(U, (r2, rpad), (fr, frp))

    Ur_loc = jax.vmap(jax.vmap(
        lambda r2, rpad: u_slice(U_r, r2, rpad, FR, FRp)
    ))(ry, rp)  # (B, nt, FR, FRp)
    Uc_loc = jax.vmap(jax.vmap(
        lambda c2, cpad: u_slice(U_c, c2, cpad, FC, FCp)
    ))(cx, cp)  # (B, nt, FC, FCp)

    row_m = jnp.einsum("btpr,btrj->btpj", row2, Ur_loc)  # (B, nt, P, FRp)
    col_m = jnp.einsum("btpw,btwj->btpj", col2, Uc_loc)  # (B, nt, P, FCp)

    rsel = jnp.einsum("btpr,btcrw->btcpw", row_m, Fp)
    out = jnp.einsum("btpw,btcpw->btcp", col_m, rsel)

    out = out.reshape(B, nh, nw, C, T, T).transpose(0, 3, 1, 4, 2, 5)
    out = out.reshape(B, C, nh * T, nw * T)
    return out[:, :, :Lh, :Lw]
