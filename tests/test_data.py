"""Data pipeline tests: record store roundtrip, prepare CLI semantics,
transforms, and the prefetching stream."""

import os

import numpy as np
import pytest
from PIL import Image

from rick_tpu.data import (
    ImageDataset,
    RecordStore,
    RecordStoreWriter,
    data_stream,
    get_nsamples,
)
from rick_tpu.data.prepare import prepare_dataset


def _make_image_dir(tmp_path, n=12, size=40):
    rng = np.random.default_rng(0)
    d = tmp_path / "imgs" / "class_a"
    d.mkdir(parents=True)
    for i in range(n):
        arr = rng.integers(0, 255, (size + i, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"img_{i:03d}.png")
    return str(tmp_path / "imgs")


def test_record_store_roundtrip(tmp_path):
    p = str(tmp_path / "store")
    with RecordStoreWriter(p) as w:
        for i in range(5):
            w.put(i, bytes([i]) * (i + 1))
    s = RecordStore(p)
    assert len(s) == 5
    assert s.get(3) == bytes([3]) * 4
    with pytest.raises(IndexError):
        s.get(5)


def test_prepare_dataset_and_load(tmp_path):
    src = _make_image_dir(tmp_path)
    out = str(tmp_path / "processed")
    n = prepare_dataset(src, out, size=32, n_worker=1)
    assert n == 12

    ds = ImageDataset(out, resolution=32, flip=False)
    assert len(ds) == 12
    rng = np.random.default_rng(0)
    img = ds.get(0, rng)
    assert img.shape == (3, 32, 32)
    assert img.dtype == np.float32
    assert -1.0 <= img.min() and img.max() <= 1.0


def test_subset_indices_mirror_few_shot(tmp_path):
    src = _make_image_dir(tmp_path)
    out = str(tmp_path / "processed")
    prepare_dataset(src, out, size=32, n_worker=1)
    ds = ImageDataset(out, resolution=32, indices=[0, 5, 7])
    assert len(ds) == 3


def test_data_stream_batches_and_loops(tmp_path):
    src = _make_image_dir(tmp_path)
    out = str(tmp_path / "processed")
    prepare_dataset(src, out, size=32, n_worker=1)
    ds = ImageDataset(out, resolution=32)
    stream = data_stream(ds, batch_size=5, seed=1)
    batches = [next(stream) for _ in range(6)]  # 12 imgs -> loops epochs
    stream.close()
    for b in batches:
        assert b.shape == (5, 3, 32, 32)


def test_data_stream_smaller_than_batch(tmp_path):
    """10-shot dataset with batch 2 works; even batch > n works via
    replacement (drop_last would otherwise starve)."""
    src = _make_image_dir(tmp_path, n=3)
    out = str(tmp_path / "p2")
    prepare_dataset(src, out, size=32, n_worker=1)
    ds = ImageDataset(out, resolution=32)
    stream = data_stream(ds, batch_size=8, seed=1)
    b = next(stream)
    stream.close()
    assert b.shape == (8, 3, 32, 32)


def test_get_nsamples(tmp_path):
    src = _make_image_dir(tmp_path)
    out = str(tmp_path / "processed")
    prepare_dataset(src, out, size=32, n_worker=1)
    ds = ImageDataset(out, resolution=32, flip=False)
    x = get_nsamples(ds, 100)
    assert x.shape == (12, 3, 32, 32)  # capped at dataset size
    x5 = get_nsamples(ds, 5)
    assert x5.shape == (5, 3, 32, 32)


def test_device_data_stream_epoch_semantics(tmp_path):
    """All-on-device few-shot stream: same epoch semantics as data_stream
    (shuffled, drop-last, loops forever), flip applied on device, one staging
    transfer."""
    import jax

    from rick_tpu.data.loader import device_data_stream

    src = _make_image_dir(tmp_path, n=10, size=36)
    out = str(tmp_path / "store10")
    prepare_dataset(src, out, size=32, n_worker=1)
    ds = ImageDataset(out, resolution=32, flip=True)

    stream = device_data_stream(ds, 4, seed=0)
    batches = [np.asarray(next(stream)) for _ in range(6)]
    for b in batches:
        assert b.shape == (4, 3, 32, 32)
        assert np.isfinite(b).all() and b.min() >= -1.0 and b.max() <= 1.0

    # each epoch draws 8 of 10 distinct images (drop_last) -- check content
    # matches the staged originals up to horizontal flip
    ds.flip = False
    rng = np.random.default_rng(0)
    originals = np.stack([ds.get(i, rng) for i in range(10)])

    def matches_some_original(img):
        for o in originals:
            if np.allclose(img, o, atol=1e-6) or np.allclose(img, o[:, :, ::-1], atol=1e-6):
                return True
        return False

    for b in batches:
        for img in b:
            assert matches_some_original(img)
