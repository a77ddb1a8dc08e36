"""Offline dataset preparation: images -> record store of PNG blobs.

Mirror of `prepare_data.py` (reference): walk an ImageFolder-style directory
(class subdirs or flat), resize shorter side with LANCZOS, center-crop, PNG
encode, write blobs keyed 0..n-1 in sorted-filename order, via a
multiprocessing pool.
"""

from __future__ import annotations

import multiprocessing
import os
from functools import partial
from io import BytesIO
from typing import List

from PIL import Image

from rick_tpu.data.store import RecordStoreWriter

_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".webp", ".tiff"}

_RESAMPLE = {"lanczos": Image.LANCZOS, "bilinear": Image.BILINEAR}


def list_images(input_path: str) -> List[str]:
    """All image files under input_path (recursive), sorted by path --
    matching torchvision ImageFolder's sorted ordering (`prepare_data.py:45`)."""
    files = []
    for root, _dirs, names in os.walk(input_path):
        for name in names:
            if os.path.splitext(name)[1].lower() in _EXTS:
                files.append(os.path.join(root, name))
    return sorted(files)


def _resize_and_encode(item, size: int, resample):
    i, path = item
    img = Image.open(path).convert("RGB")
    w, h = img.size
    if min(w, h) != size:
        if w < h:
            nw, nh = size, max(1, round(h * size / w))
        else:
            nw, nh = max(1, round(w * size / h)), size
        img = img.resize((nw, nh), resample)
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    buf = BytesIO()
    img.save(buf, format="png")
    return i, buf.getvalue()


def prepare_dataset(
    input_path: str,
    output_path: str,
    *,
    size: int = 256,
    n_worker: int = 8,
    resample: str = "lanczos",
) -> int:
    files = list_images(input_path)
    if not files:
        raise IOError(f"no images under {input_path}")
    items = list(enumerate(files))
    fn = partial(_resize_and_encode, size=size, resample=_RESAMPLE[resample])

    with RecordStoreWriter(output_path) as writer:
        if n_worker <= 1:
            for item in items:
                i, blob = fn(item)
                writer.put(i, blob)
        else:
            with multiprocessing.Pool(n_worker) as pool:
                for i, blob in pool.imap_unordered(fn, items):
                    writer.put(i, blob)
    return len(files)
