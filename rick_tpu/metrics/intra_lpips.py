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


def reference_preprocess(imgs: np.ndarray, size: int = 256) -> np.ndarray:
    """The reference's PNG-round-trip + transforms preprocessing
    (`eval.py:96,113-118`): samples are SAVED as 8-bit PNGs, reloaded, resized
    to 256 (PIL bilinear, antialiased), and mapped to [-1, 1].  The uint8
    quantization is part of the measured protocol, so it is replicated here
    (jax.image.resize 'bilinear' follows the same antialiased PIL convention).
    """
    import jax.image

    x = np.asarray(imgs, np.float32)
    x = np.clip(np.rint((x + 1.0) * 127.5), 0, 255) / 127.5 - 1.0  # PNG u8
    if x.shape[2] != size or x.shape[3] != size:
        x = np.asarray(
            jax.image.resize(
                jnp.asarray(x), (x.shape[0], x.shape[1], size, size), method="bilinear"
            )
        )
    return x


class IntraLPIPS:
    def __init__(self, cluster_centers: np.ndarray, *, cluster_size: int = 50, batch: int = 8,
                 preprocess: bool = True, size: int = 256, vgg_params=None, lin_weights=None):
        """cluster_centers: (K, 3, H, W) images in [-1, 1] (the reference loads
        them from `../cluster_centers/{data}/{method}/c{k}/center.png`).

        preprocess=True applies `reference_preprocess` (uint8 quantization +
        resize-to-256) to centers AND samples, matching the reference's
        save-PNG-then-reload protocol; False compares raw tensors.
        vgg_params/lin_weights override the default LPIPS weights (tests)."""
        self.preprocess = preprocess
        self.size = size
        centers = np.asarray(cluster_centers, np.float32)
        self.centers = reference_preprocess(centers, size) if preprocess else centers
        self.cluster_size = cluster_size
        self.batch = batch
        self.vgg = vgg_params if vgg_params is not None else default_vgg16_params()
        self.lin = lin_weights if lin_weights is not None else default_lin_weights()
        self._dist = jax.jit(
            lambda a, b: lpips_distance(a, b, vgg_params=self.vgg, lin_weights=self.lin)
        )

    def _assign_pre(self, imgs: np.ndarray) -> np.ndarray:
        """argmin-LPIPS cluster index per (already preprocessed) image."""
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

    def assign(self, imgs: np.ndarray) -> np.ndarray:
        """Cluster index per image (argmin LPIPS to each center),
        `eval.py:123-155`."""
        if self.preprocess:
            imgs = reference_preprocess(np.asarray(imgs, np.float32), self.size)
        return self._assign_pre(imgs)

    def compute(self, imgs: np.ndarray, *, rng: Optional[np.random.Generator] = None) -> float:
        """Average intra-cluster pairwise LPIPS (`eval.py:158-200`)."""
        rng = rng or np.random.default_rng(0)
        if self.preprocess:
            imgs = reference_preprocess(np.asarray(imgs, np.float32), self.size)
        labels = self._assign_pre(imgs)
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


def prepare_cluster_centers(images: np.ndarray, out_dir: str) -> None:
    """Write the reference's cluster-center directory layout:
    `{out_dir}/c{k}/center.png` for each image (K = len(images)).

    The few-shot adaptation protocol (Ojha et al., adopted by the reference at
    `eval.py:129-131`) uses the K target-domain training images themselves as
    cluster centers; this utility materializes that layout so
    `compute_intra_lpips` / the reference code can consume it.  images:
    (K, 3, H, W) in [-1, 1]."""
    from rick_tpu.utils import save_image_grid

    images = np.asarray(images, np.float32)
    for k in range(images.shape[0]):
        d = os.path.join(out_dir, f"c{k}")
        os.makedirs(d, exist_ok=True)
        save_image_grid(images[k : k + 1], os.path.join(d, "center.png"), nrow=1, padding=0)
