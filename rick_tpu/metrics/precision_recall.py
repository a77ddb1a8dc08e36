"""Improved Precision & Recall (k-NN manifolds over VGG16-fc2 features).

Mirror of `gan_metrics/precision_recall.py:34-260`: radii = distance to the
k-th (k=3) nearest neighbor (excluding self), precision = fraction of subject
samples inside any reference ball, recall = symmetric.
"""

from __future__ import annotations

from collections import namedtuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rick_tpu.metrics.vgg import default_vgg16_params, vgg16_fc2_features

Manifold = namedtuple("Manifold", ["features", "radii"])
PrecisionAndRecall = namedtuple("PrecisionAndRecall", ["precision", "recall"])


def compute_pairwise_distances(X, Y=None) -> np.ndarray:
    """Euclidean distance matrix in float64 (`precision_recall.py:185-220`)."""
    X = np.asarray(X, np.float64)
    Y = X if Y is None else np.asarray(Y, np.float64)
    x2 = np.sum(X**2, axis=1, keepdims=True)
    y2 = np.sum(Y**2, axis=1, keepdims=True)
    d2 = x2 - 2 * X.dot(Y.T) + y2.T
    np.clip(d2, 0, None, out=d2)
    return np.sqrt(d2)


def distances2radii(distances: np.ndarray, k: int = 3) -> np.ndarray:
    """k-th NN distance per row, self excluded (`:223-236`)."""
    n = distances.shape[0]
    radii = np.zeros(n)
    for i in range(n):
        idx = np.argpartition(distances[i], k + 1)
        radii[i] = distances[i][idx[: k + 1]].max()
    return radii


def compute_metric(manifold_ref: Manifold, feats_subject: np.ndarray) -> float:
    """Fraction of subject points inside any reference ball (`:239-245`)."""
    dist = compute_pairwise_distances(manifold_ref.features, feats_subject)
    inside = (dist < manifold_ref.radii[:, None]).any(axis=0)
    return float(inside.mean())


def realism(manifold_real: Manifold, feat_subject: np.ndarray) -> float:
    """max over reference of radius/distance (`:256-266`)."""
    dists = np.linalg.norm(manifold_real.features - feat_subject, axis=1)
    eps = 1e-6
    return float(np.max(manifold_real.radii / (dists + eps)))


class IPR:
    """Mirror of the reference IPR class (`precision_recall.py:34-110`)."""

    def __init__(self, batch_size: int = 50, k: int = 3, num_samples: int = 10000, params=None):
        self.batch_size = batch_size
        self.k = k
        self.num_samples = num_samples
        self.params = params if params is not None else default_vgg16_params()
        self.manifold_ref = None
        self._fwd = jax.jit(vgg16_fc2_features)

    def extract_features(self, images) -> np.ndarray:
        images = np.asarray(images, np.float32)
        feats = []
        for s in range(0, images.shape[0], self.batch_size):
            batch = jnp.asarray(images[s : s + self.batch_size])
            feats.append(np.asarray(self._fwd(self.params, batch), np.float64))
        return np.concatenate(feats, axis=0)

    def compute_manifold(self, images) -> Manifold:
        feats = self.extract_features(images)
        radii = distances2radii(compute_pairwise_distances(feats), k=self.k)
        return Manifold(feats, radii)

    def compute_manifold_ref(self, images):
        self.manifold_ref = self.compute_manifold(images)

    def precision_and_recall(self, subject) -> PrecisionAndRecall:
        assert self.manifold_ref is not None, "call compute_manifold_ref() first"
        manifold_subject = self.compute_manifold(subject)
        precision = compute_metric(self.manifold_ref, manifold_subject.features)
        recall = compute_metric(manifold_subject, self.manifold_ref.features)
        return PrecisionAndRecall(precision, recall)

    __call__ = precision_and_recall

    def realism(self, image) -> float:
        feat = self.extract_features(image)[0]
        return realism(self.manifold_ref, feat)
