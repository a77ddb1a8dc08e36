"""Standalone FID CLI, mirror of `gan_metrics/fid_score.py:285-308`:
FID between two paths (image directories, .npy arrays, or record stores),
with optional bootstrap resampling (`:241-282`)."""

from __future__ import annotations

import argparse
import os
import pathlib

import numpy as np


def _load_images(path: str, size: int) -> np.ndarray:
    if path.endswith(".npy"):
        imgs = np.load(path)
        if imgs.shape[1] != 3:
            imgs = imgs.transpose(0, 3, 1, 2)
        return imgs.astype(np.float32)
    if os.path.isdir(path) and (
        os.path.exists(os.path.join(path, "records.rdb"))
        or os.path.exists(os.path.join(path, "data.mdb"))
    ):
        from rick_tpu.data import ImageDataset, get_nsamples

        ds = ImageDataset(path, resolution=size, flip=False)
        return get_nsamples(ds, len(ds))
    # directory of images
    from rick_tpu.data.loader import _decode, train_transform

    files = sorted(
        str(f) for f in pathlib.Path(path).iterdir()
        if f.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    rng = np.random.default_rng(0)
    imgs = []
    for f in files:
        with open(f, "rb") as fh:
            imgs.append(train_transform(_decode(fh.read()), size, rng, flip=False))
    return np.stack(imgs)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("path", type=str, nargs=2, help="image dirs / .npy / record stores")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--bootstrap", action="store_true")
    p.add_argument("--n_bootstraps", type=int, default=10)
    args = p.parse_args(argv)

    from rick_tpu.metrics import calculate_fid_given_images

    imgs0 = _load_images(args.path[0], args.size)
    imgs1 = _load_images(args.path[1], args.size)

    if args.bootstrap:
        rng = np.random.default_rng(0)
        fids = []
        n = min(len(imgs0), len(imgs1))
        for _ in range(args.n_bootstraps):
            fids.append(
                calculate_fid_given_images(
                    imgs0[rng.choice(len(imgs0), n, replace=True)],
                    imgs1[rng.choice(len(imgs1), n, replace=True)],
                    args.batch_size,
                )
            )
        print(f"FID: {np.mean(fids):.4f} ({np.std(fids):.4f})")
    else:
        fid = calculate_fid_given_images(imgs0, imgs1, args.batch_size)
        print("FID: ", fid)


if __name__ == "__main__":
    main()
