"""Host-side image loading: decode pool -> transform -> device prefetch.

Replaces the reference's torch DataLoader with 8 workers
(`train_dynamic_update_prune.py:823-843`).  Decoding uses cv2 (fast libpng/
libjpeg path) with a PIL fallback; transforms mirror the reference's
torchvision chain (`:789-808`): Resize(size) -> CenterCrop(size) ->
RandomHorizontalFlip -> ToTensor -> Normalize(0.5, 0.5) producing NCHW float32
in [-1, 1].  `data_stream` runs a background thread that keeps a small queue
of ready device arrays (double-buffered H2D overlap).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from rick_tpu.data.store import open_image_store


def _decode(blob: bytes) -> np.ndarray:
    """PNG/JPEG bytes -> HWC uint8 RGB."""
    if _HAS_CV2:
        arr = cv2.imdecode(np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR)
        return cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)
    from io import BytesIO

    from PIL import Image

    return np.asarray(Image.open(BytesIO(blob)).convert("RGB"))


def _resize_shorter(img: np.ndarray, size: int) -> np.ndarray:
    """torchvision Resize(size): scale shorter side to `size` (bilinear)."""
    h, w = img.shape[:2]
    if min(h, w) == size:
        return img
    if h < w:
        nh, nw = size, max(1, round(w * size / h))
    else:
        nh, nw = max(1, round(h * size / w)), size
    if _HAS_CV2:
        return cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    from PIL import Image

    return np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))


def _center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return img[top : top + size, left : left + size]


def train_transform(img: np.ndarray, size: int, rng: np.random.Generator, *, flip: bool = True) -> np.ndarray:
    """Reference train transform chain -> CHW float32 in [-1, 1]."""
    img = _resize_shorter(img, size)
    img = _center_crop(img, size)
    if flip and rng.random() < 0.5:
        img = img[:, ::-1]
    out = img.astype(np.float32) / 127.5 - 1.0
    return np.ascontiguousarray(out.transpose(2, 0, 1))


class ImageDataset:
    """RecordStore/lmdb-backed dataset (mirror of `MultiResolutionDataset`)."""

    def __init__(self, path: str, resolution: int = 256, *, flip: bool = True, indices=None):
        self.store = open_image_store(path)
        self.resolution = resolution
        self.flip = flip
        self.indices = list(indices) if indices is not None else list(range(len(self.store)))

    def __len__(self):
        return len(self.indices)

    def get(self, i: int, rng: np.random.Generator) -> np.ndarray:
        blob = self.store.get(self.indices[i])
        return train_transform(_decode(blob), self.resolution, rng, flip=self.flip)


def data_stream(
    dataset: ImageDataset,
    batch_size: int,
    *,
    seed: int = 0,
    shuffle: bool = True,
    drop_last: bool = True,
    device_put=None,
    prefetch: int = 2,
) -> Iterator:
    """Infinite batch iterator with background prefetch.

    Mirrors `sample_data(DataLoader(...))` (`:76-79,823-831`): epoch-shuffled,
    drop-last batching, looping forever.  `device_put` (e.g. jax.device_put or
    a sharding-aware closure) runs on the producer thread so H2D transfer
    overlaps the training step.
    """
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def producer():
        rng = np.random.default_rng(seed)
        n = len(dataset)
        while not stop.is_set():
            order = rng.permutation(n) if shuffle else np.arange(n)
            end = n - (n % batch_size) if drop_last else n
            if end == 0:
                # dataset smaller than batch: sample with replacement
                order = rng.integers(0, n, size=batch_size)
                end = batch_size
            decode_batch = getattr(dataset, "decode_batch", None)
            for s in range(0, end, batch_size):
                idx = order[s : s + batch_size]
                if decode_batch is not None:  # native C++ threaded decode
                    batch = decode_batch(idx, rng)
                else:
                    batch = np.stack([dataset.get(int(i), rng) for i in idx])
                if device_put is not None:
                    batch = device_put(batch)
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    class _Stream:
        def __iter__(self):
            return self

        def __next__(self):
            return q.get()

        def close(self):
            stop.set()

    return _Stream()


def device_data_stream(
    dataset: ImageDataset,
    batch_size: int,
    *,
    seed: int = 0,
    shuffle: bool = True,
    drop_last: bool = True,
    stage_put=None,
    out_sharding=None,
):
    """Few-shot dataset staged ENTIRELY in HBM; per-iteration batches are a
    jitted on-device gather + random horizontal flip.

    Motivation (measured, see ROUND2.md): on the high-latency host<->device
    link a per-iteration 1.5 MB `device_put` of the real batch dominates the
    whole training step (~1.3 s vs the 105 ms compute), while tiny scalar
    uploads pipeline for free.  For the 10-shot regime the decoded dataset is
    ~7.5 MB: ONE staging transfer, then the only per-iteration host->device
    traffic is a (batch,) int32 index vector.

    Epoch semantics mirror `data_stream` (shuffled, drop-last, loop forever);
    the flip is applied on device with `jax.random` instead of host numpy.
    `stage_put` places the staged (N,3,H,W) array (e.g. replicate over the
    mesh); `out_sharding` shards the emitted batch (e.g. along 'data').
    """
    import functools

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n = len(dataset)

    # decode everything once, flips OFF (flip happens on device per draw)
    old_flip = dataset.flip
    dataset.flip = False
    try:
        decode_batch = getattr(dataset, "decode_batch", None)
        if decode_batch is not None:
            imgs = decode_batch(np.arange(n), rng)
        else:
            imgs = np.stack([dataset.get(i, rng) for i in range(n)])
    finally:
        dataset.flip = old_flip

    imgs_dev = stage_put(imgs) if stage_put is not None else jax.device_put(imgs)

    @functools.partial(jax.jit, out_shardings=out_sharding)
    def fetch(images, idx, key):
        b = images[idx]
        do = jax.random.bernoulli(key, 0.5, (idx.shape[0],))
        return jnp.where(do[:, None, None, None], b[..., ::-1], b)

    base_key = jax.random.key(seed + 13)

    class _DeviceStream:
        def __init__(self):
            self._order = np.empty((0,), np.int64)
            self._pos = 0
            self._step = 0

        def __iter__(self):
            return self

        def __next__(self):
            if self._pos + batch_size > len(self._order):
                order = rng.permutation(n) if shuffle else np.arange(n)
                end = n - (n % batch_size) if drop_last else n
                if end == 0:  # dataset smaller than batch
                    order = rng.integers(0, n, size=batch_size)
                    end = batch_size
                self._order = order[:end]
                self._pos = 0
            idx = jnp.asarray(self._order[self._pos : self._pos + batch_size], jnp.int32)
            self._pos += batch_size
            self._step += 1
            return fetch(imgs_dev, idx, jax.random.fold_in(base_key, self._step))

        def close(self):
            pass

    return _DeviceStream()


def get_nsamples(dataset: ImageDataset, n: int, *, seed: int = 0) -> np.ndarray:
    """First-n eval-set cache, mirror of `get_nsamples_lmdb`
    (`gan_training/utils.py:38-49`): sequential batches until n collected
    (capped at the dataset size)."""
    rng = np.random.default_rng(seed)
    n = min(n, len(dataset))
    return np.stack([dataset.get(i, rng) for i in range(n)])
