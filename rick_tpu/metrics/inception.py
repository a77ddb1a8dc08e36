"""InceptionV3 (torchvision architecture) in functional JAX, pool3 features.

Mirror of the reference's FID feature extractor
(`gan_training/metrics/inception.py`): torchvision `inception_v3` truncated
after the final average pool (2048-d), with the reference wrapper's input
handling -- bilinear resize to 299 (align_corners=False) and remapping of
[-1,1] inputs to ImageNet normalization (`inception.py:88-96`).

Parameters live in a FLAT dict keyed by the torchvision state-dict names
(`Mixed_5b.branch1x1.conv.weight`, `...bn.running_var`, ...), so a real
`inception_v3` .pth checkpoint loads directly via ckpt.load_torch_file.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# Architecture spec: name -> (in_ch, out_ch, (kh, kw), (sh, sw), (ph, pw))
# ---------------------------------------------------------------------------


def _conv(name, i, o, k, s=(1, 1), p=(0, 0)):
    if isinstance(k, int):
        k = (k, k)
    return (name, i, o, k, s, p)


def _inception_a(prefix, in_ch, pool_ch):
    return [
        _conv(f"{prefix}.branch1x1", in_ch, 64, 1),
        _conv(f"{prefix}.branch5x5_1", in_ch, 48, 1),
        _conv(f"{prefix}.branch5x5_2", 48, 64, 5, p=(2, 2)),
        _conv(f"{prefix}.branch3x3dbl_1", in_ch, 64, 1),
        _conv(f"{prefix}.branch3x3dbl_2", 64, 96, 3, p=(1, 1)),
        _conv(f"{prefix}.branch3x3dbl_3", 96, 96, 3, p=(1, 1)),
        _conv(f"{prefix}.branch_pool", in_ch, pool_ch, 1),
    ]


def _inception_b(prefix, in_ch):
    return [
        _conv(f"{prefix}.branch3x3", in_ch, 384, 3, s=(2, 2)),
        _conv(f"{prefix}.branch3x3dbl_1", in_ch, 64, 1),
        _conv(f"{prefix}.branch3x3dbl_2", 64, 96, 3, p=(1, 1)),
        _conv(f"{prefix}.branch3x3dbl_3", 96, 96, 3, s=(2, 2)),
    ]


def _inception_c(prefix, in_ch, c7):
    return [
        _conv(f"{prefix}.branch1x1", in_ch, 192, 1),
        _conv(f"{prefix}.branch7x7_1", in_ch, c7, 1),
        _conv(f"{prefix}.branch7x7_2", c7, c7, (1, 7), p=(0, 3)),
        _conv(f"{prefix}.branch7x7_3", c7, 192, (7, 1), p=(3, 0)),
        _conv(f"{prefix}.branch7x7dbl_1", in_ch, c7, 1),
        _conv(f"{prefix}.branch7x7dbl_2", c7, c7, (7, 1), p=(3, 0)),
        _conv(f"{prefix}.branch7x7dbl_3", c7, c7, (1, 7), p=(0, 3)),
        _conv(f"{prefix}.branch7x7dbl_4", c7, c7, (7, 1), p=(3, 0)),
        _conv(f"{prefix}.branch7x7dbl_5", c7, 192, (1, 7), p=(0, 3)),
        _conv(f"{prefix}.branch_pool", in_ch, 192, 1),
    ]


def _inception_d(prefix, in_ch):
    return [
        _conv(f"{prefix}.branch3x3_1", in_ch, 192, 1),
        _conv(f"{prefix}.branch3x3_2", 192, 320, 3, s=(2, 2)),
        _conv(f"{prefix}.branch7x7x3_1", in_ch, 192, 1),
        _conv(f"{prefix}.branch7x7x3_2", 192, 192, (1, 7), p=(0, 3)),
        _conv(f"{prefix}.branch7x7x3_3", 192, 192, (7, 1), p=(3, 0)),
        _conv(f"{prefix}.branch7x7x3_4", 192, 192, 3, s=(2, 2)),
    ]


def _inception_e(prefix, in_ch):
    return [
        _conv(f"{prefix}.branch1x1", in_ch, 320, 1),
        _conv(f"{prefix}.branch3x3_1", in_ch, 384, 1),
        _conv(f"{prefix}.branch3x3_2a", 384, 384, (1, 3), p=(0, 1)),
        _conv(f"{prefix}.branch3x3_2b", 384, 384, (3, 1), p=(1, 0)),
        _conv(f"{prefix}.branch3x3dbl_1", in_ch, 448, 1),
        _conv(f"{prefix}.branch3x3dbl_2", 448, 384, 3, p=(1, 1)),
        _conv(f"{prefix}.branch3x3dbl_3a", 384, 384, (1, 3), p=(0, 1)),
        _conv(f"{prefix}.branch3x3dbl_3b", 384, 384, (3, 1), p=(1, 0)),
        _conv(f"{prefix}.branch_pool", in_ch, 192, 1),
    ]


def _all_convs():
    convs = [
        _conv("Conv2d_1a_3x3", 3, 32, 3, s=(2, 2)),
        _conv("Conv2d_2a_3x3", 32, 32, 3),
        _conv("Conv2d_2b_3x3", 32, 64, 3, p=(1, 1)),
        _conv("Conv2d_3b_1x1", 64, 80, 1),
        _conv("Conv2d_4a_3x3", 80, 192, 3),
    ]
    convs += _inception_a("Mixed_5b", 192, 32)
    convs += _inception_a("Mixed_5c", 256, 64)
    convs += _inception_a("Mixed_5d", 288, 64)
    convs += _inception_b("Mixed_6a", 288)
    for name, c7 in [("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160), ("Mixed_6e", 192)]:
        convs += _inception_c(name, 768, c7)
    convs += _inception_d("Mixed_7a", 768)
    convs += _inception_e("Mixed_7b", 1280)
    convs += _inception_e("Mixed_7c", 2048)
    return convs


_CONVS = _all_convs()
_SPEC = {name: (i, o, k, s, p) for name, i, o, k, s, p in _CONVS}


def inception_init(key=None, seed: int = 0) -> Dict[str, jnp.ndarray]:
    """Deterministic He-normal init with identity-ish BN stats (fallback when
    no pretrained weights are available)."""
    if key is None:
        key = jax.random.key(seed)
    params: Dict[str, jnp.ndarray] = {}
    kfc, key = jax.random.split(key)
    params["fc.weight"] = jax.random.normal(kfc, (1000, 2048), jnp.float32) * 0.02
    params["fc.bias"] = jnp.zeros((1000,), jnp.float32)
    keys = jax.random.split(key, len(_CONVS))
    for kk, (name, i, o, k, s, p) in zip(keys, _CONVS):
        fan_in = i * k[0] * k[1]
        params[f"{name}.conv.weight"] = (
            jax.random.normal(kk, (o, i, k[0], k[1]), jnp.float32)
            * np.sqrt(2.0 / fan_in)
        )
        params[f"{name}.bn.weight"] = jnp.ones((o,), jnp.float32)
        params[f"{name}.bn.bias"] = jnp.zeros((o,), jnp.float32)
        params[f"{name}.bn.running_mean"] = jnp.zeros((o,), jnp.float32)
        params[f"{name}.bn.running_var"] = jnp.ones((o,), jnp.float32)
    return params


def inception_init_np(seed: int = 0) -> Dict[str, np.ndarray]:
    """Host-side (numpy) variant of `inception_init`: same keys/shapes, no
    device compiles.  For compile-budget-sensitive callers (the multi-chip
    dryrun) where ~100 distinct-shape `jax.random.normal` programs would cost
    real wall-clock on a cold cache; values are still He-normal."""
    rng = np.random.default_rng(seed)
    params: Dict[str, np.ndarray] = {
        "fc.weight": (rng.standard_normal((1000, 2048)) * 0.02).astype(np.float32),
        "fc.bias": np.zeros((1000,), np.float32),
    }
    for name, i, o, k, s, p in _CONVS:
        fan_in = i * k[0] * k[1]
        params[f"{name}.conv.weight"] = (
            rng.standard_normal((o, i, k[0], k[1])) * np.sqrt(2.0 / fan_in)
        ).astype(np.float32)
        params[f"{name}.bn.weight"] = np.ones((o,), np.float32)
        params[f"{name}.bn.bias"] = np.zeros((o,), np.float32)
        params[f"{name}.bn.running_mean"] = np.zeros((o,), np.float32)
        params[f"{name}.bn.running_var"] = np.ones((o,), np.float32)
    return params


def load_inception_params(path: str) -> Dict[str, jnp.ndarray]:
    """Load a torchvision inception_v3 state dict (.pth) into the flat param
    dict (AuxLogits / fc entries are ignored)."""
    from rick_tpu.ckpt import load_torch_file

    sd = load_torch_file(path)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    params = {}
    for name in _SPEC:
        for suffix in ("conv.weight", "bn.weight", "bn.bias", "bn.running_mean", "bn.running_var"):
            key = f"{name}.{suffix}"
            params[key] = jnp.asarray(np.asarray(sd[key], np.float32))
    for key in ("fc.weight", "fc.bias"):
        if key in sd:
            params[key] = jnp.asarray(np.asarray(sd[key], np.float32))
    return params


def default_inception_params() -> Dict[str, jnp.ndarray]:
    path = os.environ.get("RICK_INCEPTION_WEIGHTS", "")
    if path and os.path.exists(path):
        return load_inception_params(path)
    return inception_init()


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def params_to_nhwc(params):
    """Pre-transpose every conv weight OIHW -> HWIO for the NHWC trunk (do it
    ONCE at setup; avoids a per-call transpose of ~24M weights)."""
    out = {}
    for k, v in params.items():
        if k.endswith("conv.weight"):
            out[k] = jnp.transpose(v, (2, 3, 1, 0))
        else:
            out[k] = v
    return out


def _conv_bn(params, name, x, nhwc=False):
    i, o, k, s, p = _SPEC[name]
    w = params[f"{name}.conv.weight"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w, window_strides=s, padding=((p[0], p[0]), (p[1], p[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC") if nhwc else ("NCHW", "OIHW", "NCHW"),
    )
    gamma = params[f"{name}.bn.weight"]
    beta = params[f"{name}.bn.bias"]
    mean = params[f"{name}.bn.running_mean"]
    var = params[f"{name}.bn.running_var"]
    scale = (gamma * lax.rsqrt(var + 1e-3)).astype(x.dtype)
    shift = (beta - mean * gamma * lax.rsqrt(var + 1e-3)).astype(x.dtype)
    cshape = (1, 1, 1, -1) if nhwc else (1, -1, 1, 1)
    y = y * scale.reshape(cshape) + shift.reshape(cshape)
    return jax.nn.relu(y)


def _maxpool(x, k=3, s=2, nhwc=False):
    dims = (1, k, k, 1) if nhwc else (1, 1, k, k)
    strides = (1, s, s, 1) if nhwc else (1, 1, s, s)
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, "VALID")


def _avgpool3_s1_p1(x, nhwc=False):
    dims = (1, 3, 3, 1) if nhwc else (1, 1, 3, 3)
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)] if nhwc else [(0, 0), (0, 0), (1, 1), (1, 1)]
    s = lax.reduce_window(x, 0.0, lax.add, dims, (1, 1, 1, 1), pad)
    return s / 9.0  # count_include_pad=True (torch default)


def _block_a(params, prefix, x, nhwc=False):
    ax = 3 if nhwc else 1
    b1 = _conv_bn(params, f"{prefix}.branch1x1", x, nhwc)
    b5 = _conv_bn(params, f"{prefix}.branch5x5_2", _conv_bn(params, f"{prefix}.branch5x5_1", x, nhwc), nhwc)
    b3 = _conv_bn(params, f"{prefix}.branch3x3dbl_1", x, nhwc)
    b3 = _conv_bn(params, f"{prefix}.branch3x3dbl_2", b3, nhwc)
    b3 = _conv_bn(params, f"{prefix}.branch3x3dbl_3", b3, nhwc)
    bp = _conv_bn(params, f"{prefix}.branch_pool", _avgpool3_s1_p1(x, nhwc), nhwc)
    return jnp.concatenate([b1, b5, b3, bp], axis=ax)


def _block_b(params, prefix, x, nhwc=False):
    ax = 3 if nhwc else 1
    b3 = _conv_bn(params, f"{prefix}.branch3x3", x, nhwc)
    bd = _conv_bn(params, f"{prefix}.branch3x3dbl_1", x, nhwc)
    bd = _conv_bn(params, f"{prefix}.branch3x3dbl_2", bd, nhwc)
    bd = _conv_bn(params, f"{prefix}.branch3x3dbl_3", bd, nhwc)
    bp = _maxpool(x, nhwc=nhwc)
    return jnp.concatenate([b3, bd, bp], axis=ax)


def _block_c(params, prefix, x, nhwc=False):
    ax = 3 if nhwc else 1
    b1 = _conv_bn(params, f"{prefix}.branch1x1", x, nhwc)
    b7 = _conv_bn(params, f"{prefix}.branch7x7_1", x, nhwc)
    b7 = _conv_bn(params, f"{prefix}.branch7x7_2", b7, nhwc)
    b7 = _conv_bn(params, f"{prefix}.branch7x7_3", b7, nhwc)
    bd = _conv_bn(params, f"{prefix}.branch7x7dbl_1", x, nhwc)
    for i in range(2, 6):
        bd = _conv_bn(params, f"{prefix}.branch7x7dbl_{i}", bd, nhwc)
    bp = _conv_bn(params, f"{prefix}.branch_pool", _avgpool3_s1_p1(x, nhwc), nhwc)
    return jnp.concatenate([b1, b7, bd, bp], axis=ax)


def _block_d(params, prefix, x, nhwc=False):
    ax = 3 if nhwc else 1
    b3 = _conv_bn(params, f"{prefix}.branch3x3_2", _conv_bn(params, f"{prefix}.branch3x3_1", x, nhwc), nhwc)
    b7 = _conv_bn(params, f"{prefix}.branch7x7x3_1", x, nhwc)
    b7 = _conv_bn(params, f"{prefix}.branch7x7x3_2", b7, nhwc)
    b7 = _conv_bn(params, f"{prefix}.branch7x7x3_3", b7, nhwc)
    b7 = _conv_bn(params, f"{prefix}.branch7x7x3_4", b7, nhwc)
    bp = _maxpool(x, nhwc=nhwc)
    return jnp.concatenate([b3, b7, bp], axis=ax)


def _block_e(params, prefix, x, nhwc=False):
    ax = 3 if nhwc else 1
    b1 = _conv_bn(params, f"{prefix}.branch1x1", x, nhwc)
    b3 = _conv_bn(params, f"{prefix}.branch3x3_1", x, nhwc)
    b3 = jnp.concatenate(
        [_conv_bn(params, f"{prefix}.branch3x3_2a", b3, nhwc), _conv_bn(params, f"{prefix}.branch3x3_2b", b3, nhwc)],
        axis=ax,
    )
    bd = _conv_bn(params, f"{prefix}.branch3x3dbl_1", x, nhwc)
    bd = _conv_bn(params, f"{prefix}.branch3x3dbl_2", bd, nhwc)
    bd = jnp.concatenate(
        [_conv_bn(params, f"{prefix}.branch3x3dbl_3a", bd, nhwc), _conv_bn(params, f"{prefix}.branch3x3dbl_3b", bd, nhwc)],
        axis=ax,
    )
    bp = _conv_bn(params, f"{prefix}.branch_pool", _avgpool3_s1_p1(x, nhwc), nhwc)
    return jnp.concatenate([b1, b3, bd, bp], axis=ax)


def inception_pool3(
    params, x, *, resize_input: bool = True, normalize_input: bool = True, nhwc: bool = False,
    stop_at: str = None, resize_to: int = 299,
):
    """pool3 (2048-d) activations for images x in [-1, 1], NCHW.

    Mirrors the reference wrapper (`gan_training/metrics/inception.py:83-106`):
    bilinear resize to 299x299, per-channel remap from [-1,1] to ImageNet
    normalization, then the torchvision trunk to the final avgpool.

    nhwc=True runs the trunk in NHWC (the TPU-preferred conv layout; input
    stays NCHW at the API -- one transpose up front).  Requires params
    pre-transposed with `params_to_nhwc`.  Values match NCHW up to fp
    reassociation (tested).

    stop_at / resize_to are COMPILE/EXECUTION-BUDGET levers for the
    multi-chip DRYRUN only (never metric paths): `stop_at="Mixed_6a"` pools
    right after the named block (same structure, reduced depth -- e.g. 768-d
    instead of 2048-d), and `resize_to` shrinks the input resize target
    (minimum useful ~75: three stride-2 stages need spatial room).  Real
    FID/KID always use the full trunk at 299.
    """
    from rick_tpu.metrics.resize import bilinear_resize_torch

    if nhwc:
        x = jnp.transpose(x, (0, 2, 3, 1))
        if resize_input:
            # exact F.upsample(bilinear, align_corners=False) semantics -- NO
            # antialias, so 512/1024px downscales match the reference too
            x = bilinear_resize_torch(x, resize_to, resize_to, nhwc=True)
    elif resize_input:
        x = bilinear_resize_torch(x, resize_to, resize_to)
    if normalize_input:
        scale = jnp.asarray([0.229 / 0.5, 0.224 / 0.5, 0.225 / 0.5], x.dtype)
        shift = jnp.asarray(
            [(0.485 - 0.5) / 0.5, (0.456 - 0.5) / 0.5, (0.406 - 0.5) / 0.5], x.dtype
        )
        cshape = (1, 1, 1, 3) if nhwc else (1, 3, 1, 1)
        x = x * scale.reshape(cshape) + shift.reshape(cshape)

    stages = [
        ("Conv2d_1a_3x3", lambda x: _conv_bn(params, "Conv2d_1a_3x3", x, nhwc)),
        ("Conv2d_2a_3x3", lambda x: _conv_bn(params, "Conv2d_2a_3x3", x, nhwc)),
        ("Conv2d_2b_3x3", lambda x: _maxpool(_conv_bn(params, "Conv2d_2b_3x3", x, nhwc), nhwc=nhwc)),
        ("Conv2d_3b_1x1", lambda x: _conv_bn(params, "Conv2d_3b_1x1", x, nhwc)),
        ("Conv2d_4a_3x3", lambda x: _maxpool(_conv_bn(params, "Conv2d_4a_3x3", x, nhwc), nhwc=nhwc)),
        ("Mixed_5b", lambda x: _block_a(params, "Mixed_5b", x, nhwc)),
        ("Mixed_5c", lambda x: _block_a(params, "Mixed_5c", x, nhwc)),
        ("Mixed_5d", lambda x: _block_a(params, "Mixed_5d", x, nhwc)),
        ("Mixed_6a", lambda x: _block_b(params, "Mixed_6a", x, nhwc)),
        ("Mixed_6b", lambda x: _block_c(params, "Mixed_6b", x, nhwc)),
        ("Mixed_6c", lambda x: _block_c(params, "Mixed_6c", x, nhwc)),
        ("Mixed_6d", lambda x: _block_c(params, "Mixed_6d", x, nhwc)),
        ("Mixed_6e", lambda x: _block_c(params, "Mixed_6e", x, nhwc)),
        ("Mixed_7a", lambda x: _block_d(params, "Mixed_7a", x, nhwc)),
        ("Mixed_7b", lambda x: _block_e(params, "Mixed_7b", x, nhwc)),
        ("Mixed_7c", lambda x: _block_e(params, "Mixed_7c", x, nhwc)),
    ]
    for name, fn in stages:
        x = fn(x)
        if stop_at is not None and name == stop_at:
            break
    return jnp.mean(x, axis=(1, 2) if nhwc else (2, 3))  # avg pool -> (N, 2048)


def inception_logits(params, x, *, resize_input: bool = True):
    """1000-way logits (for the KL-based Inception Score,
    `gan_training/metrics/inception_score.py:12-58`).  The reference feeds
    generator-range images with no ImageNet renormalization
    (transform_input=False and no wrapper) -- replicated."""
    pooled = inception_pool3(params, x, resize_input=resize_input, normalize_input=False)
    return pooled @ params["fc.weight"].T + params["fc.bias"]
