"""In-training evaluator, mirror of `gan_training/eval.py:13-66`, TPU-first.

Protocol parity: `inception_nsamples` images from fresh N(0,1) latents through
the EMA generator; FID (always), KID (first 2000), precision/recall on demand
against the cached real set.

TPU-native design (vs the reference's generate -> host numpy -> re-upload
loop, `eval.py:34-50`): generation and InceptionV3 pool3 feature extraction
are ONE jitted function, so only (chunk, 2048) activations ever leave the
device -- the 5000 generated images never cross the host boundary.  Real-set
activations are computed once at construction and cached (the reference
recomputes them every eval; same numbers, strictly less work).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rick_tpu.metrics.fid import calculate_frechet_distance, get_activations
from rick_tpu.metrics.inception import default_inception_params, inception_pool3
from rick_tpu.metrics.kid import polynomial_mmd_averages
from rick_tpu.metrics.precision_recall import IPR
from rick_tpu.metrics.vgg import vgg16_fc2_features
from rick_tpu.nn.generator import generator_apply


class Evaluator:
    def __init__(
        self,
        gcfg,
        *,
        fid_real_samples: np.ndarray,
        inception_nsamples: int = 5000,
        batch_size: int = 64,
        n_sample_store: int = 25,
        latent: int = 512,
        compute_pr: bool = False,
        inception_params=None,
        gen_batch: int = 100,
        seed: int = 0,
    ):
        self.gcfg = gcfg
        self.real = np.asarray(fid_real_samples, np.float32)
        self.inception_nsamples = inception_nsamples
        self.batch_size = batch_size
        self.n_sample_store = n_sample_store
        self.latent = latent
        self.gen_batch = min(gen_batch, inception_nsamples)
        self.inception_params = (
            inception_params if inception_params is not None else default_inception_params()
        )
        self._key = jax.random.key(seed)
        self.ipr = IPR(batch_size, k=3, num_samples=inception_nsamples) if compute_pr else None

        # fused generator -> pool3 activations (images never leave the device)
        def gen_acts(gp, incp, z, k):
            imgs, _ = generator_apply(gcfg, gp, [z], rng=k)
            return inception_pool3(incp, imgs)

        self._gen_acts = jax.jit(gen_acts)
        self._gen = jax.jit(lambda gp, z, k: generator_apply(gcfg, gp, [z], rng=k)[0])
        if compute_pr:
            def gen_vgg(gp, vp, z, k):
                imgs, _ = generator_apply(gcfg, gp, [z], rng=k)
                return vgg16_fc2_features(vp, imgs)

            self._gen_vgg = jax.jit(gen_vgg)

        # real-set activations cached once
        self._real_acts = get_activations(self.real, batch_size, self.inception_params)

    # ------------------------------------------------------------------
    def _fake_activations(self, g_ema, n: int) -> np.ndarray:
        outs = []
        got = 0
        while got < n:
            self._key, kz, kn = jax.random.split(self._key, 3)
            z = jax.random.normal(kz, (self.gen_batch, self.latent))
            acts = self._gen_acts(g_ema, self.inception_params, z, kn)
            outs.append(np.asarray(acts, np.float64))
            got += acts.shape[0]
        return np.concatenate(outs, axis=0)[:n]

    def generate(self, g_ema, n: Optional[int] = None) -> np.ndarray:
        """Generated images on host (for grids / interop), chunked like the
        reference (`eval.py:34-41`)."""
        n = n or self.inception_nsamples
        outs = []
        got = 0
        while got < n:
            self._key, kz, kn = jax.random.split(self._key, 3)
            z = jax.random.normal(kz, (self.n_sample_store, self.latent))
            imgs = self._gen(g_ema, z, kn)
            outs.append(np.asarray(imgs, np.float32))
            got += imgs.shape[0]
        return np.concatenate(outs, axis=0)[:n]

    def compute_inception_score(
        self, g_ema, *, fid: bool = True, kid: bool = False, pr: bool = False
    ) -> Dict[str, float]:
        fake_acts = self._fake_activations(g_ema, self.inception_nsamples)
        score: Dict[str, float] = {}
        if fid:
            m1 = self._real_acts.mean(axis=0)
            s1 = np.cov(self._real_acts, rowvar=False)
            m2 = fake_acts.mean(axis=0)
            s2 = np.cov(fake_acts, rowvar=False)
            score["fid"] = calculate_frechet_distance(m1, s1, m2, s2)
        if kid:
            mmds, _ = polynomial_mmd_averages(
                self._real_acts[:2000], fake_acts[:2000], n_subsets=100
            )
            score["kid"] = float(mmds.mean())
        if pr:
            self.ipr.compute_manifold_ref(self.real)
            # generate a fresh VGG-feature set on device
            feats = []
            got = 0
            while got < self.inception_nsamples:
                self._key, kz, kn = jax.random.split(self._key, 3)
                z = jax.random.normal(kz, (self.gen_batch, self.latent))
                f = self._gen_vgg(g_ema, self.ipr.params, z, kn)
                feats.append(np.asarray(f, np.float64))
                got += f.shape[0]
            feats = np.concatenate(feats)[: self.inception_nsamples]
            from rick_tpu.metrics.precision_recall import (
                Manifold,
                compute_metric,
                compute_pairwise_distances,
                distances2radii,
            )

            radii = distances2radii(compute_pairwise_distances(feats), k=self.ipr.k)
            manifold_subject = Manifold(feats, radii)
            score["precision"] = compute_metric(self.ipr.manifold_ref, feats)
            score["recall"] = compute_metric(manifold_subject, self.ipr.manifold_ref.features)
        return score
