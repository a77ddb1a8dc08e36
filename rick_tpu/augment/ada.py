"""ADA ("non-leaking") augmentation, fully jit-compatible.

Reference: `/root/reference/non_leaking.py`.  The geometric pipeline there is:
sample a random affine G per image, compute the padding needed so the inverse
warp never samples out of bounds, reflect-pad (with a RETRY LOOP when the pad
exceeds the image size, `non_leaking.py:288-313`), antialias 2x-upsample with
the sym6 wavelet, bilinear grid_sample, 2x-downsample, crop.

TPU-native reformulation (static shapes, no retry):

  * The reference output depends on its dynamic G-derived pad only through a
    subpixel phase; we fix a STATIC margin M and mirror the reference's
    coordinate formulas with pad == M.  The image is physically reflect-padded
    by M + pad_k (pad_k = 6, the sym6 support); sample coordinates beyond that
    are folded back by coordinate reflection inside the sampler, supplying
    multi-mirrored content instead of the reference's true reflect-pad.
  * HONESTY NOTE on M (default 224 since round 5): the reference's dynamic
    pad for a rotated 256px image is ~(sqrt(2)-1)*256 = 106 pixels BEFORE
    scaling/translation (worst case with the clamped scale tails:
    ~(sqrt(2)*1.5-1+0.25)*128 = 175), so M=224 covers the rotation worst
    case at 256px -- full border parity.  Exactness holds for every
    transform whose dynamic pad is <= M; at SMALLER margins (e.g.
    --ada_margin 64, the round-1..4 default) full rotations read
    mirror-folded pixels where the reference read singly-reflected pad.
    The 64-vs-224 A/B at three seed pairs (ROUND5.md; best FID 6.35/6.15,
    4.96/4.38, 3.84/3.44, 224 better in all three) motivated the flip.  The
    FIR pair cost scales ~(size+2M)^2; the warp itself is margin-cost-free
    (grid restricted to the crop-surviving window).  For other resolutions
    size//2 + size//4 + 32 generalizes the full-parity choice.
  * The non-leaking property is unaffected either way (the augmentation stays
    a fixed per-transform linear map of the image).
  * sym6 is an orthogonal wavelet, so the up2(flip k) -> down2(k) pair is
    perfect-reconstruction: with G == I the pipeline returns the input exactly,
    which pins down every offset in the coordinate bookkeeping (tested).

All randomness uses `jax.random`; the augmentation probability `p` may be a
traced scalar (it is: ADA adapts it during training).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rick_tpu.ops import upfirdn2d
from rick_tpu.ops.resample import upfirdn2d_separable
from rick_tpu.augment.warp import warp_bilinear_matmul, warp_bilinear_matmul_fir


def _warp_mode() -> str:
    """Bilinear-warp lowering: 'matmul_fir' (tiled interpolation matmuls with
    the up2-FIR FOLDED into the tap matrices -- the 2x intermediate is never
    materialized and per-tile footprints shrink 4x; default), 'matmul' (tiled
    matmuls over the materialized 2x image), or 'gather' (4-tap point gather;
    the direct grid_sample transcription).  All produce the same values
    (matmul vs gather bit-identical; the FIR fold equal up to fp
    reassociation -- tested).  RICK_ADA_WARP overrides."""
    import os

    return os.environ.get("RICK_ADA_WARP", "matmul_fir")

# sym6 wavelet taps (`non_leaking.py:9-22`)
SYM6 = (
    0.015404109327027373,
    0.0034907120842174702,
    -0.11799011114819057,
    -0.048311742585633,
    0.4910559419267466,
    0.787641141030194,
    0.3379294217276218,
    -0.07263752278646252,
    -0.021060292512300564,
    0.04472490177066578,
    0.0017677118642428036,
    -0.007800708325034148,
)


# ---------------------------------------------------------------------------
# Random matrix sampling (`non_leaking.py:25-241`)
# ---------------------------------------------------------------------------


def _translate_mat(t_x, t_y):
    b = t_x.shape[0]
    m = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (b, 1, 1))
    m = m.at[:, 0, 2].set(t_x)
    m = m.at[:, 1, 2].set(t_y)
    return m


def _rotate_mat(theta):
    b = theta.shape[0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    m = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (b, 1, 1))
    m = m.at[:, 0, 0].set(c)
    m = m.at[:, 0, 1].set(-s)
    m = m.at[:, 1, 0].set(s)
    m = m.at[:, 1, 1].set(c)
    return m


def _scale_mat(s_x, s_y):
    b = s_x.shape[0]
    m = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (b, 1, 1))
    m = m.at[:, 0, 0].set(s_x)
    m = m.at[:, 1, 1].set(s_y)
    return m


def _translate3d_mat(t):
    b = t.shape[0]
    m = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
    m = m.at[:, 0, 3].set(t)
    m = m.at[:, 1, 3].set(t)
    m = m.at[:, 2, 3].set(t)
    return m


def _scale3d_mat(s):
    b = s.shape[0]
    m = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
    m = m.at[:, 0, 0].set(s)
    m = m.at[:, 1, 1].set(s)
    m = m.at[:, 2, 2].set(s)
    return m


_AXIS = np.full((3,), 1.0 / math.sqrt(3.0), np.float32)


def _luma_flip_mat(i):
    axis = jnp.asarray(np.concatenate([_AXIS, [0.0]]).astype(np.float32))
    eye = jnp.eye(4, dtype=jnp.float32)[None]
    flip = 2.0 * jnp.outer(axis, axis)[None] * i[:, None, None]
    return eye - flip


def _saturation_mat(i):
    axis = jnp.asarray(np.concatenate([_AXIS, [0.0]]).astype(np.float32))
    outer = jnp.outer(axis, axis)[None]
    eye = jnp.eye(4, dtype=jnp.float32)[None]
    return outer + (eye - outer) * i[:, None, None]


def _rotate3d_mat(theta):
    """Rotation about the (1,1,1)/sqrt(3) axis (`non_leaking.py:67-85`)."""
    u = _AXIS
    eye3 = np.eye(3, dtype=np.float32)
    cross = np.array(
        [(0, -u[2], u[1]), (u[2], 0, -u[0]), (-u[1], u[0], 0)], np.float32
    )
    outer = np.outer(u, u).astype(np.float32)
    s = jnp.sin(theta)[:, None, None]
    c = jnp.cos(theta)[:, None, None]
    rot = c * eye3[None] + s * cross[None] + (1 - c) * outer[None]
    b = theta.shape[0]
    m = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
    return m.at[:, :3, :3].set(rot)


def _random_apply(key, p, transform, prev):
    b = transform.shape[0]
    select = jax.random.bernoulli(key, p, (b,)).astype(jnp.float32)[:, None, None]
    eye = jnp.eye(transform.shape[-1], dtype=jnp.float32)[None]
    return (select * transform + (1 - select) * eye) @ prev


def _lognormal(key, shape, std):
    return jnp.exp(jax.random.normal(key, shape) * std)


def sample_affine(key, p, size: int, height: int, width: int):
    """Random per-image 3x3 affine, mirror of `sample_affine`
    (`non_leaking.py:151-207`).  `p` may be traced."""
    keys = jax.random.split(key, 16)
    G = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (size, 1, 1))

    # flip
    param = jax.random.randint(keys[0], (size,), 0, 2).astype(jnp.float32)
    Gc = _scale_mat(1 - 2.0 * param, jnp.ones((size,)))
    G = _random_apply(keys[1], p, Gc, G)

    # 90-degree rotate: category (0, 3)
    cat = jnp.asarray([0.0, 3.0])
    param = cat[jax.random.randint(keys[2], (size,), 0, 2)]
    Gc = _rotate_mat(-math.pi / 2 * param)
    G = _random_apply(keys[3], p, Gc, G)

    # integer translate
    param = jax.random.uniform(keys[4], (size,), minval=-0.125, maxval=0.125)
    ph = jnp.round(param * height) / height
    pw = jnp.round(param * width) / width
    G = _random_apply(keys[5], p, _translate_mat(pw, ph), G)

    # isotropic scale
    param = _lognormal(keys[6], (size,), 0.2 * math.log(2))
    G = _random_apply(keys[7], p, _scale_mat(param, param), G)

    p_rot = 1 - jnp.sqrt(jnp.clip(1 - p, 0.0, 1.0))

    # pre-rotate
    param = jax.random.uniform(keys[8], (size,), minval=-math.pi, maxval=math.pi)
    G = _random_apply(keys[9], p_rot, _rotate_mat(-param), G)

    # anisotropic scale
    param = _lognormal(keys[10], (size,), 0.2 * math.log(2))
    G = _random_apply(keys[11], p, _scale_mat(param, 1 / param), G)

    # post-rotate
    param = jax.random.uniform(keys[12], (size,), minval=-math.pi, maxval=math.pi)
    G = _random_apply(keys[13], p_rot, _rotate_mat(-param), G)

    # fractional translate (same sample for both axes, as in the reference)
    param = jax.random.normal(keys[14], (size,)) * 0.125
    G = _random_apply(keys[15], p, _translate_mat(param, param), G)

    return G


def sample_color(key, p, size: int):
    """Random per-image 4x4 color matrix, mirror of `sample_color`
    (`non_leaking.py:210-241`)."""
    keys = jax.random.split(key, 10)
    C = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (size, 1, 1))

    # brightness
    param = jax.random.normal(keys[0], (size,)) * 0.2
    C = _random_apply(keys[1], p, _translate3d_mat(param), C)
    # contrast
    param = _lognormal(keys[2], (size,), 0.5 * math.log(2))
    C = _random_apply(keys[3], p, _scale3d_mat(param), C)
    # luma flip
    param = jax.random.randint(keys[4], (size,), 0, 2).astype(jnp.float32)
    C = _random_apply(keys[5], p, _luma_flip_mat(param), C)
    # hue rotation
    param = jax.random.uniform(keys[6], (size,), minval=-math.pi, maxval=math.pi)
    C = _random_apply(keys[7], p, _rotate3d_mat(param), C)
    # saturation
    param = _lognormal(keys[8], (size,), 1.0 * math.log(2))
    C = _random_apply(keys[9], p, _saturation_mat(param), C)

    return C


# ---------------------------------------------------------------------------
# Geometric application (`non_leaking.py:316-371`), static-shape version
# ---------------------------------------------------------------------------


def _reflect_coord(pix, size):
    """Fold a continuous pixel coordinate into [-0.5, size-0.5) by mirror
    reflection about the image edges (grid_sample 'reflection',
    align_corners=False convention)."""
    period = 2.0 * size
    t = jnp.mod(pix + 0.5, period)
    t = jnp.where(t < 0, t + period, t)
    t = jnp.where(t >= size, period - t - 1e-6, t)  # mirror upper half
    return t - 0.5


def _bilinear_sample_reflect(img, x_pix, y_pix):
    """Bilinear sample img (C,H,W) at continuous pixel coords (H_out,W_out),
    reflecting out-of-range coordinates."""
    C, H, W = img.shape
    x = _reflect_coord(x_pix, W)
    y = _reflect_coord(y_pix, H)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    def gather(yy, xx):
        return img[:, yy, xx]  # (C, H_out, W_out)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _reflect101_pad(img, pad: int):
    """Reflect-pad (edge pixel not duplicated, matching F.pad mode='reflect')
    by arbitrary `pad`, via index gather -- works even for pad >= size, where
    torch would raise (the cause of the reference's retry loop,
    `non_leaking.py:301-311`): content beyond one mirror period is simply the
    next mirror image."""
    B, C, H, W = img.shape

    def refl_idx(n, p):
        i = np.arange(-p, n + p)
        period = 2 * (n - 1) if n > 1 else 1
        m = np.abs(i) % period
        return np.where(m < n, m, period - m)

    yi = jnp.asarray(refl_idx(H, pad))
    xi = jnp.asarray(refl_idx(W, pad))
    return img[:, :, yi, :][:, :, :, xi]


def apply_affine(img, G, *, margin: int = 64, antialiasing_kernel=SYM6):
    """Apply per-image affine G with the reference's antialiased warp chain.

    `margin` is the static pad M standing in for the reference's per-batch
    dynamic `get_padding` result.  Whenever the dynamic pad would have been
    <= M, the computation below is the reference's math exactly (same padded
    content, same grid, same crop); for more extreme transforms the sampler's
    coordinate reflection supplies multi-mirrored content instead of the
    reference's retry loop.
    """
    kernel_1d = jnp.asarray(antialiasing_kernel, jnp.float32)
    kernel_1d_flip = jnp.flip(kernel_1d)
    len_k = len(antialiasing_kernel)
    pad_k = (len_k + 1) // 2  # 6

    B, C, h_o, w_o = img.shape
    M = margin

    # physically build the reference's padded image: reflect pad by M + pad_k
    img_pad = _reflect101_pad(img, M + pad_k)
    mode = _warp_mode()
    if mode == "matmul_fir":
        # the 2x image is never built -- the warp folds the up2-FIR into its
        # tap matrices; only its (virtual) dimensions are needed for coords
        img_2x = None
        H2 = 2 * img_pad.shape[2] - (len_k - 1)
        W2 = 2 * img_pad.shape[3] - (len_k - 1)
    else:
        # separable: outer(flip k, flip k) == flip2d(outer(k, k))
        img_2x = upfirdn2d_separable(img_pad, kernel_1d_flip, up=2)
        H2, W2 = img_2x.shape[2], img_2x.shape[3]  # 2*(h_o+2M+2*pad_k) - (len_k-1)

    w_p = w_o + 2 * M + 1
    h_p = h_o + 2 * M + 1

    x0 = -2.0 * M / w_o - 1.0
    x1 = 2.0 * (w_p - M) / w_o - 1.0
    y0 = -2.0 * M / h_o - 1.0
    y1 = 2.0 * (h_p - M) / h_o - 1.0

    # The final crop keeps rows [M, M+h_o) of the downsampled result, which
    # depend only on sampled 2x rows [2M, 2M + 2h_o + (len_k-2)] -- so only
    # that static window of the reference's grid is evaluated (exact same
    # values; the warp cost becomes independent of the margin).
    Lh = 2 * h_o + len_k - 2
    Lw = 2 * w_o + len_k - 2
    gx = jnp.linspace(x0, x1, W2, dtype=jnp.float32)[2 * M : 2 * M + Lw]
    gy = jnp.linspace(y0, y1, H2, dtype=jnp.float32)[2 * M : 2 * M + Lh]
    grid_x = jnp.broadcast_to(gx[None, :], (Lh, Lw))
    grid_y = jnp.broadcast_to(gy[:, None], (Lh, Lw))

    G_inv = jnp.linalg.inv(G)  # (B,3,3)

    def coords_one(gi):
        # affine_grid: (x', y') = Ginv[:2,:] @ (x, y, 1)
        xp = gi[0, 0] * grid_x + gi[0, 1] * grid_y + gi[0, 2]
        yp = gi[1, 0] * grid_x + gi[1, 1] * grid_y + gi[1, 2]
        # renormalize into padded-image space (`non_leaking.py:349-353`)
        xp = xp * (w_o / w_p) + ((w_o + 2.0 * M) / w_p - 1.0)
        yp = yp * (h_o / h_p) + ((h_o + 2.0 * M) / h_p - 1.0)
        # 2x pixel coords, align_corners=False convention
        x_pix = (xp + 1.0) * W2 / 2.0 - 0.5
        y_pix = (yp + 1.0) * H2 / 2.0 - 0.5
        return x_pix, y_pix

    x_pix, y_pix = jax.vmap(coords_one)(G_inv)  # (B,Lh,Lw) each
    if mode == "matmul_fir":
        # TPU path: FIR-folded tiled interpolation matmuls (augment/warp.py).
        # The kernel is passed as a STATIC numpy array: the fold builds the
        # up2 band matrix at trace time.
        import numpy as _np

        k_static = _np.flip(_np.asarray(antialiasing_kernel, _np.float32)).copy()
        img_affine = warp_bilinear_matmul_fir(img_pad, x_pix, y_pix, k_static)
    elif mode == "matmul":
        # tiled 2-tap interpolation matmuls (MXU fwd AND bwd) --
        # exact same taps/weights as the gather sampler (see augment/warp.py)
        img_affine = warp_bilinear_matmul(img_2x, x_pix, y_pix)
    else:
        img_affine = jax.vmap(_bilinear_sample_reflect)(img_2x, x_pix, y_pix)

    # down2 'valid' over the restricted window directly yields the crop
    img_down = upfirdn2d_separable(img_affine, kernel_1d, down=2)  # (B,C,h_o,w_o)
    return img_down


def apply_color(img, mat):
    """Per-pixel 3x3 color matmul + offset (`non_leaking.py:374-382`)."""
    rgb = jnp.einsum("bij,bjhw->bihw", mat[:, :3, :3], img)
    return rgb + mat[:, :3, 3][:, :, None, None]


def augment(key, img, p, *, margin: int = 224, transform=(None, None)):
    """Full ADA augment (`non_leaking.py:394-398`): affine then color.

    Returns (img, (G, C)).  `p` may be a traced scalar.
    """
    kg, kc = jax.random.split(key)
    B = img.shape[0]
    G = transform[0]
    if G is None:
        G = sample_affine(kg, p, B, img.shape[2], img.shape[3])
    C = transform[1]
    if C is None:
        C = sample_color(kc, p, B)
    img = apply_affine(img, G, margin=margin)
    img = apply_color(img, C)
    return img, (G, C)
