"""Dataset factory (`gan_training/inputs.py:7-45`): image folders and npy
arrays (the reference's cifar10/lsun branches require torchvision downloads
and are gated behind availability)."""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def get_dataset(name: str, data_dir: str, size: int = 64, *, flip: bool = True):
    """Returns an object with __len__ and get(i, rng) -> (3, size, size) float32
    in [-1, 1], mirroring the transform chain of the reference."""
    if name == "image":
        from rick_tpu.data.loader import _decode, train_transform

        files = sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(data_dir)
            for f in fs
            if os.path.splitext(f)[1].lower() in (".png", ".jpg", ".jpeg", ".webp")
        )

        class _ImageFolder:
            def __len__(self):
                return len(files)

            def get(self, i, rng):
                with open(files[i], "rb") as fh:
                    return train_transform(_decode(fh.read()), size, rng, flip=flip)

        return _ImageFolder()

    if name == "npy":
        arr = np.load(data_dir, mmap_mode="r")

        class _Npy:
            def __len__(self):
                return arr.shape[0]

            def get(self, i, rng):
                x = np.asarray(arr[i], np.float32)
                if x.ndim == 3 and x.shape[-1] in (1, 3):
                    x = x.transpose(2, 0, 1)
                if x.max() > 1.5:
                    x = x / 127.5 - 1.0
                if flip and rng.random() < 0.5:
                    x = x[:, :, ::-1]
                return np.ascontiguousarray(x)

        return _Npy()

    raise NotImplementedError(
        f"dataset '{name}' requires torchvision downloads (unavailable here); "
        "supported: image, npy"
    )
