"""Intra-cluster LPIPS diversity, mirror of `gan_training/eval.py:83-220`:
assign generated samples to 10 precomputed cluster-center images by minimum
LPIPS, then average pairwise LPIPS within each cluster (up to `cluster_size`
members)."""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rick_tpu.metrics.lpips import default_lin_weights, lpips_distance
from rick_tpu.metrics.vgg import default_vgg16_params


class IntraLPIPS:
    def __init__(self, cluster_centers: np.ndarray, *, cluster_size: int = 50, batch: int = 8):
        """cluster_centers: (K, 3, H, W) images in [-1, 1] (the reference loads
        them from `../cluster_centers/{data}/{method}/c{k}/center.png`)."""
        self.centers = np.asarray(cluster_centers, np.float32)
        self.cluster_size = cluster_size
        self.batch = batch
        self.vgg = default_vgg16_params()
        self.lin = default_lin_weights()
        self._dist = jax.jit(
            lambda a, b: lpips_distance(a, b, vgg_params=self.vgg, lin_weights=self.lin)
        )

    def assign(self, imgs: np.ndarray) -> np.ndarray:
        """Cluster index per image (argmin LPIPS to each center),
        `eval.py:123-155`."""
        K = self.centers.shape[0]
        dists = np.zeros((imgs.shape[0], K))
        for k in range(K):
            center = jnp.asarray(np.repeat(self.centers[k : k + 1], self.batch, axis=0))
            for s in range(0, imgs.shape[0], self.batch):
                chunk = np.asarray(imgs[s : s + self.batch], np.float32)
                c = center[: chunk.shape[0]]
                dists[s : s + chunk.shape[0], k] = np.asarray(
                    self._dist(jnp.asarray(chunk), c)
                )
        return np.argmin(dists, axis=1)

    def compute(self, imgs: np.ndarray, *, rng: Optional[np.random.Generator] = None) -> float:
        """Average intra-cluster pairwise LPIPS (`eval.py:158-200`)."""
        rng = rng or np.random.default_rng(0)
        labels = self.assign(imgs)
        cluster_means: List[float] = []
        for k in range(self.centers.shape[0]):
            members = np.where(labels == k)[0]
            if len(members) < 2:
                continue
            rng.shuffle(members)
            members = members[: self.cluster_size]
            pair_a, pair_b = [], []
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    pair_a.append(members[i])
                    pair_b.append(members[j])
            dists = []
            for s in range(0, len(pair_a), self.batch):
                a = jnp.asarray(np.asarray(imgs[pair_a[s : s + self.batch]], np.float32))
                b = jnp.asarray(np.asarray(imgs[pair_b[s : s + self.batch]], np.float32))
                dists.append(np.asarray(self._dist(a, b)))
            cluster_means.append(float(np.concatenate(dists).mean()))
        return float(np.mean(cluster_means)) if cluster_means else float("nan")


def load_cluster_centers(base_path: str, k: int = 10, size: int = 256) -> np.ndarray:
    """Read `c{0..k-1}/center.png` like the reference (`eval.py:131-138`)."""
    from rick_tpu.data.loader import _decode, train_transform

    rng = np.random.default_rng(0)
    centers = []
    for i in range(k):
        p = os.path.join(base_path, f"c{i}", "center.png")
        with open(p, "rb") as fh:
            centers.append(train_transform(_decode(fh.read()), size, rng, flip=False))
    return np.stack(centers)
