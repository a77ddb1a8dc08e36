"""In-training evaluator, mirror of `gan_training/eval.py:13-66`.

Generates `inception_nsamples` images from fresh N(0,1) latents in
`n_sample_store`-sized chunks through the EMA generator, then computes FID
(always), KID (first 2000) and precision/recall on demand against the cached
real set.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rick_tpu.metrics.fid import calculate_fid_given_images
from rick_tpu.metrics.kid import calculate_kid_given_images
from rick_tpu.metrics.precision_recall import IPR
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
        seed: int = 0,
    ):
        self.gcfg = gcfg
        self.real = np.asarray(fid_real_samples, np.float32)
        self.inception_nsamples = inception_nsamples
        self.batch_size = batch_size
        self.n_sample_store = n_sample_store
        self.latent = latent
        self.inception_params = inception_params
        self._key = jax.random.key(seed)
        self.ipr = IPR(batch_size, k=3, num_samples=inception_nsamples) if compute_pr else None
        self._fwd = jax.jit(
            lambda gp, z, k: generator_apply(gcfg, gp, [z], rng=k)[0]
        )

    def generate(self, g_ema, n: Optional[int] = None) -> np.ndarray:
        """n generated images (NCHW, [-1,1]) in n_sample_store chunks with
        fresh random latents (`eval.py:34-41`)."""
        n = n or self.inception_nsamples
        outs = []
        got = 0
        while got < n:
            self._key, kz, kn = jax.random.split(self._key, 3)
            z = jax.random.normal(kz, (self.n_sample_store, self.latent))
            imgs = self._fwd(g_ema, z, kn)
            outs.append(np.asarray(imgs, np.float32))
            got += imgs.shape[0]
        return np.concatenate(outs, axis=0)[:n]

    def compute_inception_score(
        self, g_ema, *, fid: bool = True, kid: bool = False, pr: bool = False
    ) -> Dict[str, float]:
        fake = self.generate(g_ema)
        score: Dict[str, float] = {}
        if fid:
            score["fid"] = calculate_fid_given_images(
                self.real, fake, self.batch_size, params=self.inception_params
            )
        if kid:
            kid_mean, _ = calculate_kid_given_images(
                self.real[:2000], fake[:2000], self.batch_size, params=self.inception_params
            )
            score["kid"] = kid_mean
        if pr:
            self.ipr.compute_manifold_ref(self.real)
            precision, recall = self.ipr.precision_and_recall(fake)
            score["precision"] = precision
            score["recall"] = recall
        return score
