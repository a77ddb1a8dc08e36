"""Intra-cluster LPIPS protocol tests (VERDICT r2 #8): the
assign/min-LPIPS/intra-distance pipeline against a torch-computed oracle, the
cluster-center directory layout, and the Evaluator wiring.

Reference protocol: `gan_training/eval.py:83-220` (lpips net='vgg', K=10
centers at `../cluster_centers/{data}/{method}/c{k}/center.png`, min-LPIPS
assignment, mean pairwise LPIPS within clusters of <=50 members)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rick_tpu.metrics.intra_lpips import (
    IntraLPIPS,
    load_cluster_centers,
    prepare_cluster_centers,
    reference_preprocess,
)
from rick_tpu.metrics.lpips import _TAP_CHANNELS
from rick_tpu.metrics.vgg import vgg16_init
from tests.torch_oracles import TorchVGG16, torch_lpips


def _setup(seed=0, n=8, k=3, size=64):
    rng = np.random.default_rng(seed)
    vgg = vgg16_init(seed=51)
    lins = [rng.random(c).astype(np.float32) * 0.1 for c in _TAP_CHANNELS]
    centers = rng.uniform(-1, 1, (k, 3, size, size)).astype(np.float32)
    imgs = np.concatenate([
        np.clip(centers[i % k] + rng.normal(0, 0.15, (3, size, size)), -1, 1)[None]
        for i in range(n)
    ]).astype(np.float32)
    return vgg, lins, centers, imgs


def test_intra_lpips_pipeline_matches_torch_oracle():
    """Full pipeline (assignment labels AND the final intra-cluster value)
    against plain-torch LPIPS with identical weights."""
    vgg, lins, centers, imgs = _setup()
    il = IntraLPIPS(centers, cluster_size=50, batch=4, preprocess=False,
                    vgg_params=vgg, lin_weights=lins)
    labels = il.assign(imgs)
    val = il.compute(imgs, rng=np.random.default_rng(0))

    oracle = TorchVGG16().load_flat(vgg, dtype=torch.float64)
    with torch.no_grad():
        timgs = torch.from_numpy(imgs.astype(np.float64))
        tc = torch.from_numpy(centers.astype(np.float64))
        dists = np.stack([
            torch_lpips(oracle, timgs, tc[kk : kk + 1].expand_as(timgs), lins).numpy()
            for kk in range(centers.shape[0])
        ], axis=1)
        want_labels = np.argmin(dists, axis=1)
        np.testing.assert_array_equal(labels, want_labels)

        cluster_means = []
        for kk in range(centers.shape[0]):
            members = np.where(want_labels == kk)[0]
            if len(members) < 2:
                continue
            pair_d = []
            for a in range(len(members)):
                for b in range(a + 1, len(members)):
                    pair_d.append(float(torch_lpips(
                        oracle,
                        timgs[members[a]][None], timgs[members[b]][None], lins
                    ).numpy()[0]))
            cluster_means.append(np.mean(pair_d))
        want_val = float(np.mean(cluster_means))
    assert abs(val - want_val) < 1e-4 * max(1.0, abs(want_val))


def test_reference_preprocess_quantize_and_resize():
    """uint8 PNG-round-trip quantization is exact; resize lands on 256."""
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 3, 256, 256)).astype(np.float32)
    q = reference_preprocess(x)
    # same-size: only quantization
    expect = np.clip(np.rint((x + 1) * 127.5), 0, 255) / 127.5 - 1.0
    np.testing.assert_allclose(q, expect, atol=1e-6)

    small = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    out = reference_preprocess(small)
    assert out.shape == (2, 3, 256, 256)
    assert np.isfinite(out).all() and abs(out).max() <= 1.0 + 1e-5


def test_prepare_and_load_cluster_centers_roundtrip(tmp_path):
    """prepare_cluster_centers writes the reference's c{k}/center.png layout;
    load_cluster_centers reads it back to within uint8 quantization."""
    rng = np.random.default_rng(2)
    imgs = rng.uniform(-1, 1, (4, 3, 32, 32)).astype(np.float32)
    prepare_cluster_centers(imgs, str(tmp_path))
    for k in range(4):
        assert (tmp_path / f"c{k}" / "center.png").exists()
    back = load_cluster_centers(str(tmp_path), k=4, size=32)
    np.testing.assert_allclose(back, imgs, atol=1.5 / 127.5)


@pytest.mark.slow
def test_evaluator_compute_intra_lpips_smoke(tmp_path):
    """Evaluator.compute_intra_lpips wiring: generate -> assign -> intra
    distance on a tiny generator, consuming the prepared center layout."""
    import jax

    from rick_tpu.metrics.evaluator import Evaluator
    from rick_tpu.metrics.inception import inception_init
    from rick_tpu.nn import GeneratorConfig, generator_init

    rng = np.random.default_rng(3)
    centers = rng.uniform(-1, 1, (3, 3, 16, 16)).astype(np.float32)
    prepare_cluster_centers(centers, str(tmp_path))

    gcfg = GeneratorConfig(size=16)
    g = generator_init(jax.random.key(0), gcfg)
    real = rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32)
    ev = Evaluator(gcfg, fid_real_samples=real, inception_nsamples=4,
                   batch_size=4, gen_batch=2, n_sample_store=4,
                   inception_params=inception_init(seed=0))
    val = ev.compute_intra_lpips(g, str(tmp_path), n_samples=6, k=3, cluster_size=5)
    assert np.isfinite(val) or np.isnan(val)  # nan allowed if clusters <2 members
