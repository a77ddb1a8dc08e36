"""Tests for the legacy-infrastructure equivalents and aux metrics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rick_tpu.legacy import (
    CheckpointIO,
    Logger,
    cbatch_norm_apply,
    get_parameter_number,
    get_ydist,
    get_zdist,
    interpolate_sphere,
    spectral_norm_apply,
)


def test_zdist_ydist():
    z = get_zdist("gauss", 16)(jax.random.key(0), 8)
    assert z.shape == (8, 16)
    u = get_zdist("uniform", 4)(jax.random.key(1), 5)
    assert float(jnp.abs(u).max()) <= 1.0
    y = get_ydist(10)(jax.random.key(2), 100)
    assert int(y.max()) < 10 and int(y.min()) >= 0


def test_slerp_endpoints():
    z1 = jnp.asarray([[1.0, 0.0]])
    z2 = jnp.asarray([[0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(interpolate_sphere(z1, z2, 0.0)), np.asarray(z1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(interpolate_sphere(z1, z2, 1.0)), np.asarray(z2), atol=1e-6)
    mid = interpolate_sphere(z1, z2, 0.5)
    np.testing.assert_allclose(float(jnp.linalg.norm(mid)), 1.0, rtol=1e-5)


def test_spectral_norm_converges_to_unit_sigma():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((8, 12)).astype(np.float32))
    u = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    wn = w
    for _ in range(30):
        wn, u = spectral_norm_apply(w, u, n_iter=1)
    sigma = np.linalg.svd(np.asarray(wn), compute_uv=False)[0]
    np.testing.assert_allclose(sigma, 1.0, rtol=1e-3)


def test_cbatch_norm_shapes():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8, 5, 5)).astype(np.float32))
    g = jnp.ones((4, 8))
    b = jnp.zeros((4, 8))
    out = cbatch_norm_apply(x, g, b)
    assert out.shape == x.shape
    np.testing.assert_allclose(float(out.mean()), 0.0, atol=1e-5)


def test_checkpoint_io_roundtrip(tmp_path):
    cio = CheckpointIO(str(tmp_path))
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    cio.register_modules(gen=params)
    cio.save("model.npz", it=42)
    cio.module_dict["gen"] = {"w": jnp.zeros((2, 3))}
    manifest = cio.load("model.npz")
    assert manifest["step"] == 42
    np.testing.assert_array_equal(np.asarray(cio.module_dict["gen"]["w"]), np.arange(6.0).reshape(2, 3))


def test_logger_pickle_roundtrip(tmp_path):
    lg = Logger(log_dir=str(tmp_path / "log"), img_dir=str(tmp_path / "imgs"))
    lg.add("losses", "d", 0.5, it=1)
    lg.add("losses", "d", 0.25, it=2)
    lg.save_stats("stats.p")
    lg2 = Logger(log_dir=str(tmp_path / "log"), img_dir=str(tmp_path / "i2"))
    lg2.load_stats("stats.p")
    assert lg2.get_last("losses", "d") == 0.25


def test_parameter_number():
    p = {"a": jnp.zeros((3, 4)), "b": [jnp.zeros(5)]}
    assert get_parameter_number(p)["Total"] == 17


def test_inception_score_runs():
    from rick_tpu.metrics.inception import inception_init
    from rick_tpu.metrics.inception_score import inception_score

    imgs = np.random.default_rng(0).uniform(-1, 1, (40, 3, 75, 75)).astype(np.float32)
    mean, std = inception_score(imgs, batch_size=8, splits=2, resize=True, params=inception_init())
    assert mean > 0 and np.isfinite(mean) and np.isfinite(std)


def test_film_decompose_compose_roundtrip():
    from rick_tpu.legacy.film import (
        compose_film_generator,
        decompose_film_generator,
        strip_module_prefix,
    )

    rng = np.random.default_rng(0)
    sd = {
        "style.1.weight": rng.standard_normal((8, 8)).astype(np.float32),
        "convs.0.conv.weight": rng.standard_normal((1, 4, 3, 3, 3)).astype(np.float32),
        "to_rgbs.0.conv.modulation.weight": rng.standard_normal((4, 8)).astype(np.float32),
        "other.bias": rng.standard_normal(4).astype(np.float32),
    }
    norm, film = decompose_film_generator(sd)
    # normalized weights have ~zero mean / unit std along the decomposed axes
    w = norm["style.1.weight"]
    np.testing.assert_allclose(w.mean(axis=1), 0.0, atol=1e-5)
    np.testing.assert_allclose(w.std(axis=1), 1.0, rtol=1e-4)
    back = compose_film_generator(norm, film)
    np.testing.assert_allclose(back["style.1.weight"], sd["style.1.weight"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(back["convs.0.conv.weight"], sd["convs.0.conv.weight"], rtol=1e-4, atol=1e-5)

    stripped = strip_module_prefix({"module.a.b": 1, "c": 2})
    assert stripped == {"a.b": 1, "c": 2}


def test_lpips_identity_and_symmetry():
    from rick_tpu.metrics.lpips import lpips_distance
    from rick_tpu.metrics.vgg import vgg16_init

    vgg = vgg16_init(seed=0)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32))
    d_aa = lpips_distance(a, a, vgg_params=vgg)
    d_ab = lpips_distance(a, b, vgg_params=vgg)
    d_ba = lpips_distance(b, a, vgg_params=vgg)
    np.testing.assert_allclose(np.asarray(d_aa), 0.0, atol=1e-6)
    assert (np.asarray(d_ab) > 0).all()
    np.testing.assert_allclose(np.asarray(d_ab), np.asarray(d_ba), rtol=1e-5)


def test_intra_lpips_clusters():
    from rick_tpu.metrics.intra_lpips import IntraLPIPS

    rng = np.random.default_rng(0)
    # two very distinct "clusters": dark images and bright images
    centers = np.stack([
        np.full((3, 32, 32), -0.8, np.float32),
        np.full((3, 32, 32), 0.8, np.float32),
    ])
    dark = rng.uniform(-1.0, -0.6, (6, 3, 32, 32)).astype(np.float32)
    bright = rng.uniform(0.6, 1.0, (6, 3, 32, 32)).astype(np.float32)
    imgs = np.concatenate([dark, bright])
    il = IntraLPIPS(centers, batch=4, preprocess=False)  # raw 32px tensors
    labels = il.assign(imgs)
    assert (labels[:6] == labels[0]).all() and (labels[6:] == labels[6]).all()
    assert labels[0] != labels[6]
    val = il.compute(imgs)
    assert np.isfinite(val)


def test_get_dataset_image_and_npy(tmp_path):
    from PIL import Image

    from rick_tpu.legacy.inputs import get_dataset

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(d / f"{i}.png")
    ds = get_dataset("image", str(d), size=32)
    assert len(ds) == 3
    assert ds.get(0, rng).shape == (3, 32, 32)

    arr = rng.uniform(-1, 1, (5, 3, 16, 16)).astype(np.float32)
    np.save(tmp_path / "x.npy", arr)
    ds2 = get_dataset("npy", str(tmp_path / "x.npy"), size=16)
    assert len(ds2) == 5
    assert ds2.get(1, rng).shape == (3, 16, 16)
