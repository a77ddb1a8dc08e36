"""Metric tests: identities (FID(x,x)=0, KID(x,x)~0), the P&R toy case from
the reference (`gan_metrics/precision_recall.py:327-351`), LeNet features from
the shipped reference weights, and shape checks of the Inception port."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rick_tpu.metrics.fid import (
    calculate_fid_given_images,
    calculate_frechet_distance,
    get_activations,
)
from rick_tpu.metrics.inception import inception_init, inception_pool3
from rick_tpu.metrics.kid import polynomial_mmd_averages
from rick_tpu.metrics.precision_recall import (
    Manifold,
    compute_metric,
    compute_pairwise_distances,
    distances2radii,
)


@pytest.fixture(scope="module")
def inc_params():
    return inception_init(seed=0)


def _imgs(n=8, seed=0, size=75):
    return np.random.default_rng(seed).uniform(-1, 1, (n, 3, size, size)).astype(np.float32)


def test_inception_pool3_shape_and_determinism(inc_params):
    x = jnp.asarray(_imgs(2))
    a1 = inception_pool3(inc_params, x)
    a2 = inception_pool3(inc_params, x)
    assert a1.shape == (2, 2048)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_inception_dryrun_levers(inc_params):
    """The multi-chip dryrun's compile-budget levers must stay semantically
    pinned: stop_at pools a PREFIX of the full trunk (768-d at Mixed_6a),
    resize_to only changes the resize target, and inception_init_np produces
    the same key/shape/bn layout as inception_init."""
    from rick_tpu.metrics.inception import inception_init_np

    x = jnp.asarray(_imgs(2, size=32))
    a = inception_pool3(inc_params, x, stop_at="Mixed_6a", resize_to=75)
    assert a.shape == (2, 768)
    # full trunk at the same reduced resize still gives 2048-d
    b = inception_pool3(inc_params, x, resize_to=75)
    assert b.shape == (2, 2048)

    p_np = inception_init_np(seed=0)
    p_jax = inception_init(seed=0)
    assert set(p_np.keys()) == set(p_jax.keys())
    for k in p_np:
        assert p_np[k].shape == tuple(p_jax[k].shape), k
    # bn stats are identity-ish in both inits
    np.testing.assert_array_equal(
        p_np["Mixed_6a.branch3x3.bn.running_var"],
        np.asarray(p_jax["Mixed_6a.branch3x3.bn.running_var"]),
    )


def test_frechet_identity_zero():
    rng = np.random.default_rng(0)
    mu = rng.standard_normal(16)
    a = rng.standard_normal((64, 16))
    sigma = np.cov(a, rowvar=False)
    assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_known_value():
    # diagonal Gaussians: FID = |mu1-mu2|^2 + tr(s1 + s2 - 2 sqrt(s1 s2))
    mu1 = np.zeros(4)
    mu2 = np.ones(4)
    s1 = np.diag([1.0, 2.0, 3.0, 4.0])
    s2 = np.diag([2.0, 2.0, 2.0, 2.0])
    want = 4.0 + np.sum(np.diag(s1) + 2.0 - 2 * np.sqrt(np.diag(s1) * 2.0))
    got = calculate_frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_fid_same_set_is_zero(inc_params):
    # 12 samples give a rank-11 covariance in 2048-d; the f32 on-device
    # trace-of-sqrt loses ~1e-3 absolute on such degenerate inputs (FID signal
    # is O(10..300)).  The well-conditioned precision guard is
    # test_frechet_device_matches_scipy.
    x = _imgs(12)
    fid = calculate_fid_given_images(x, x.copy(), batch_size=6, params=inc_params)
    assert abs(fid) < 5e-2, fid


def test_fid_differs_for_different_sets(inc_params):
    a = _imgs(12, seed=1)
    b = _imgs(12, seed=2) * 0.3  # different statistics
    fid_ab = calculate_fid_given_images(a, b, batch_size=6, params=inc_params)
    assert fid_ab > 1e-3


def test_kid_same_distribution_near_zero():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((600, 64))
    b = rng.standard_normal((600, 64))
    mmds, _ = polynomial_mmd_averages(a, b, n_subsets=8, subset_size=200, seed=1)
    assert abs(mmds.mean()) < 0.05
    c = rng.standard_normal((600, 64)) * 2 + 1
    mmds_c, _ = polynomial_mmd_averages(a, c, n_subsets=8, subset_size=200, seed=1)
    assert mmds_c.mean() > 10 * abs(mmds.mean())


def test_precision_recall_toy_case():
    """The reference's toy() self-check (`precision_recall.py:327-351`):
    1-D-ish gaussian clouds offset by 1; expected P ~= R ~= overlap."""
    rng = np.random.default_rng(0)
    feats_r = rng.standard_normal((500, 4))
    feats_g = rng.standard_normal((500, 4)) + 1.0

    dist_r = compute_pairwise_distances(feats_r)
    radii_r = distances2radii(dist_r, k=3)
    m_r = Manifold(feats_r, radii_r)
    dist_g = compute_pairwise_distances(feats_g)
    radii_g = distances2radii(dist_g, k=3)
    m_g = Manifold(feats_g, radii_g)

    precision = compute_metric(m_r, feats_g)
    recall = compute_metric(m_g, feats_r)
    assert 0.05 < precision < 0.95
    assert 0.05 < recall < 0.95
    # identical sets give perfect precision/recall
    assert compute_metric(m_r, feats_r) == 1.0


def test_lenet_features_from_reference_weights():
    from rick_tpu.metrics.lenet import lenet_features, load_lenet_params

    params = load_lenet_params("/root/reference/gan_metrics/models/lenet.pth")
    # 28x28 MNIST-sized input: despite the reference docstring's "1x32x32",
    # the layer arithmetic (c5 -> 120@1x1 -> Linear(120,84)) only closes at 28.
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 1, 28, 28)).astype(np.float32))
    f = lenet_features(params, x)
    assert f.shape == (4, 84)
    assert np.isfinite(np.asarray(f)).all()
    assert np.abs(np.asarray(f)).max() <= 1.0  # tanh range


def test_vgg16_fc2_shape():
    from rick_tpu.metrics.vgg import vgg16_fc2_features, vgg16_init

    params = vgg16_init(seed=0)
    x = jnp.asarray(_imgs(2, size=64))
    f = vgg16_fc2_features(params, x)
    assert f.shape == (2, 4096)
    assert np.isfinite(np.asarray(f)).all()


def test_frechet_device_matches_scipy():
    from rick_tpu.metrics.fid import calculate_frechet_distance_device

    rng = np.random.default_rng(0)
    a = rng.standard_normal((300, 64))
    b = rng.standard_normal((300, 64)) * 1.5 + 0.3
    mu1, s1 = a.mean(0), np.cov(a, rowvar=False)
    mu2, s2 = b.mean(0), np.cov(b, rowvar=False)
    ref = calculate_frechet_distance(mu1, s1, mu2, s2)
    dev = calculate_frechet_distance_device(mu1, s1, mu2, s2)
    np.testing.assert_allclose(dev, ref, rtol=1e-3)


def test_inception_pool3_nhwc_matches_nchw(inc_params):
    """The NHWC trunk (TPU conv layout) is the same function as NCHW up to fp
    reassociation -- same resize, normalization, convs, pools."""
    from rick_tpu.metrics.inception import params_to_nhwc

    x = jnp.asarray(_imgs(2, seed=3))
    a_nchw = np.asarray(inception_pool3(inc_params, x))
    a_nhwc = np.asarray(inception_pool3(params_to_nhwc(inc_params), x, nhwc=True))
    np.testing.assert_allclose(a_nchw, a_nhwc, rtol=2e-3, atol=2e-5)
