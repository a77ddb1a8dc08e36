"""Architecture-parity tests for the metric feature extractors against
independent torch oracles (tests/torch_oracles.py).

The FID/P&R/LPIPS engines must be bit-level-architecture-correct BEFORE real
weights ever load: a wrong maxpool pad, BN eps, or resize convention would
silently poison every metric.  Both sides run IDENTICAL random weights; the
torch oracle is written from the published torchvision definitions, not from
rick_tpu's specs.

Reference wrapper conventions under test:
  * FID: bilinear resize to 299 align_corners=False, [-1,1] -> ImageNet remap
    (`gan_training/metrics/inception.py:83-106`)
  * P&R: legacy NEAREST resize to 224, no renorm
    (`gan_metrics/precision_recall.py:136-140`)
  * LPIPS net='vgg' (`gan_training/eval.py:112`): scaling layer, relu taps,
    eps-on-norm channel normalization, lin-weighted spatial mean.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tests.torch_oracles import TorchInception3, TorchVGG16, torch_lpips


def _randomize_bn(params, seed=3):
    """Non-trivial BN running stats / affine so the BN math is actually
    exercised (init gives identity stats)."""
    rng = np.random.default_rng(seed)
    out = {}
    for k, v in params.items():
        v = np.asarray(v)
        if k.endswith("bn.running_mean"):
            out[k] = rng.normal(0, 0.3, v.shape).astype(np.float32)
        elif k.endswith("bn.running_var"):
            out[k] = (0.5 + rng.random(v.shape) * 1.5).astype(np.float32)
        elif k.endswith("bn.weight"):
            out[k] = (0.7 + rng.random(v.shape)).astype(np.float32)
        elif k.endswith("bn.bias"):
            out[k] = rng.normal(0, 0.2, v.shape).astype(np.float32)
        else:
            out[k] = v
    return out


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12)


# ---------------------------------------------------------------------------
# Resize conventions
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("in_hw,out_hw", [((64, 64), (299, 299)),
                                          ((256, 256), (299, 299)),
                                          ((512, 512), (299, 299)),
                                          ((300, 200), (224, 224))])
def test_bilinear_resize_matches_torch(in_hw, out_hw):
    """bilinear_resize_torch == F.interpolate(bilinear, align_corners=False)
    for up- AND down-sampling (torch does NOT antialias; jax.image.resize
    does, which is why the metric stack cannot use it)."""
    from rick_tpu.metrics.resize import bilinear_resize_torch

    rng = np.random.default_rng(0)
    x64 = rng.standard_normal((2, 3, *in_hw))
    # convention exactness in f64 (only fp-reassociation noise)
    want64 = F.interpolate(
        torch.from_numpy(x64), size=out_hw, mode="bilinear", align_corners=False
    ).numpy()
    with jax.enable_x64(True):
        got64 = np.asarray(bilinear_resize_torch(jnp.asarray(x64), *out_hw))
    assert _rel_err(got64, want64) < 1e-12

    # f32 path: same convention, fp noise only
    x = x64.astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=False
    ).numpy()
    got = np.asarray(bilinear_resize_torch(jnp.asarray(x), *out_hw))
    assert _rel_err(got, want) < 1e-4
    got_nhwc = np.asarray(
        bilinear_resize_torch(jnp.asarray(x.transpose(0, 2, 3, 1)), *out_hw, nhwc=True)
    ).transpose(0, 3, 1, 2)
    assert _rel_err(got_nhwc, want) < 1e-4


@pytest.mark.parametrize("in_hw,out_hw", [((256, 256), (224, 224)),
                                          ((64, 64), (224, 224)),
                                          ((1024, 768), (224, 224)),
                                          ((100, 100), (224, 224))])
def test_nearest_resize_matches_torch(in_hw, out_hw):
    """nearest_resize_torch reproduces F.interpolate's legacy asymmetric
    floor(dst*scale) EXACTLY (pure gather, so bitwise)."""
    from rick_tpu.metrics.resize import nearest_resize_torch

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, *in_hw)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=out_hw).numpy()  # nearest
    got = np.asarray(nearest_resize_torch(jnp.asarray(x), *out_hw))
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# InceptionV3
# ---------------------------------------------------------------------------


def test_inception_trunk_parity_torch_oracle():
    """Full trunk (Conv1a..Mixed_7c + pool) on identical random weights, f64:
    any pooling/pad/stride/BN-eps discrepancy vs torchvision's architecture
    fails here.  96x96 input keeps the 1-core run cheap; every layer still
    executes (the trunk is input-size agnostic above ~75px)."""
    from rick_tpu.metrics.inception import inception_init, inception_pool3

    params = _randomize_bn(inception_init(seed=5))
    oracle = TorchInception3().load_flat(params, dtype=torch.float64)

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 3, 96, 96)).astype(np.float64)
    with torch.no_grad():
        want = oracle.pool3(torch.from_numpy(x)).numpy()
    with jax.enable_x64(True):
        p64 = {k: jnp.asarray(np.asarray(v), jnp.float64) for k, v in params.items()}
        got = np.asarray(
            inception_pool3(p64, jnp.asarray(x), resize_input=False, normalize_input=False)
        )
    assert got.shape == (2, 2048)
    assert _rel_err(got, want) < 1e-9


def test_inception_fid_wrapper_parity_torch_oracle():
    """End-to-end FID features — resize-to-299 + ImageNet remap + trunk — vs
    the reference wrapper semantics (`inception.py:83-106`) in torch, f64."""
    from rick_tpu.metrics.inception import inception_init, inception_pool3

    params = _randomize_bn(inception_init(seed=11), seed=13)
    oracle = TorchInception3().load_flat(params, dtype=torch.float64)

    rng = np.random.default_rng(17)
    x = (rng.random((1, 3, 64, 64)) * 2 - 1).astype(np.float64)  # [-1,1]
    with torch.no_grad():
        want = oracle.fid_features(torch.from_numpy(x)).numpy()
    with jax.enable_x64(True):
        p64 = {k: jnp.asarray(np.asarray(v), jnp.float64) for k, v in params.items()}
        got = np.asarray(inception_pool3(p64, jnp.asarray(x)))
    assert _rel_err(got, want) < 1e-9


def test_inception_nhwc_matches_oracle_too():
    """The NHWC trunk (TPU layout path) hits the same oracle numbers."""
    from rick_tpu.metrics.inception import (
        inception_init, inception_pool3, params_to_nhwc,
    )

    params = _randomize_bn(inception_init(seed=19), seed=23)
    oracle = TorchInception3().load_flat(params, dtype=torch.float64)
    rng = np.random.default_rng(29)
    x = rng.standard_normal((1, 3, 96, 96)).astype(np.float64)
    with torch.no_grad():
        want = oracle.pool3(torch.from_numpy(x)).numpy()
    with jax.enable_x64(True):
        p64 = params_to_nhwc(
            {k: jnp.asarray(np.asarray(v), jnp.float64) for k, v in params.items()}
        )
        got = np.asarray(
            inception_pool3(p64, jnp.asarray(x), resize_input=False,
                            normalize_input=False, nhwc=True)
        )
    assert _rel_err(got, want) < 1e-9


# ---------------------------------------------------------------------------
# VGG16 fc2 (precision & recall)
# ---------------------------------------------------------------------------


def test_vgg_fc2_parity_torch_oracle():
    """P&R feature extractor end-to-end: legacy-nearest resize to 224, conv
    stack, classifier[:4] (fc2 pre-ReLU) — vs the torch oracle, f64."""
    from rick_tpu.metrics.vgg import vgg16_fc2_features, vgg16_init

    params = vgg16_init(seed=31)
    oracle = TorchVGG16().load_flat(params, dtype=torch.float64)

    rng = np.random.default_rng(37)
    x = (rng.random((1, 3, 64, 64)) * 2 - 1).astype(np.float64)
    with torch.no_grad():
        want = oracle.fc2_features(torch.from_numpy(x)).numpy()
    with jax.enable_x64(True):
        p64 = {k: jnp.asarray(np.asarray(v), jnp.float64) for k, v in params.items()}
        got = np.asarray(vgg16_fc2_features(p64, jnp.asarray(x)))
    assert got.shape == (1, 4096)
    assert _rel_err(got, want) < 1e-9


# ---------------------------------------------------------------------------
# LPIPS
# ---------------------------------------------------------------------------


def test_lpips_parity_torch_oracle():
    """lpips-package forward (net='vgg') vs rick_tpu.metrics.lpips on
    identical vgg + lin weights, f64: scaling layer, tap indices,
    eps-on-norm normalization, weighted spatial mean."""
    from rick_tpu.metrics.lpips import _TAP_CHANNELS, lpips_distance
    from rick_tpu.metrics.vgg import vgg16_init

    params = vgg16_init(seed=41)
    oracle = TorchVGG16().load_flat(params, dtype=torch.float64)
    rng = np.random.default_rng(43)
    lins = [rng.random(c).astype(np.float32) * 0.1 for c in _TAP_CHANNELS]

    x0 = (rng.random((2, 3, 64, 64)) * 2 - 1).astype(np.float64)
    x1 = (rng.random((2, 3, 64, 64)) * 2 - 1).astype(np.float64)
    with torch.no_grad():
        want = torch_lpips(
            oracle, torch.from_numpy(x0), torch.from_numpy(x1), lins
        ).numpy()
    with jax.enable_x64(True):
        p64 = {k: jnp.asarray(np.asarray(v), jnp.float64) for k, v in params.items()}
        l64 = [jnp.asarray(w, jnp.float64) for w in lins]
        got = np.asarray(
            lpips_distance(jnp.asarray(x0), jnp.asarray(x1), vgg_params=p64, lin_weights=l64)
        )
    assert got.shape == (2,)
    assert _rel_err(got, want) < 1e-9
