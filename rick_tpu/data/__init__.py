"""L1 data: record-store image pipeline.

The reference stores PNG-encoded images in lmdb with keys f'{i:06d}' plus a
'length' key (`prepare_data.py:42-60`, `dataset.py:8-40`).  lmdb is not
available in this environment, so the same contract is provided by a simple
mmap-friendly record store (`store.py`), with transparent read support for
actual lmdb directories when the `lmdb` package is importable.  A native C++
reader/decoder lives in `rick_tpu/data/cpp` (see `native.py`).
"""

from rick_tpu.data.store import RecordStore, RecordStoreWriter, open_image_store
from rick_tpu.data.loader import ImageDataset, train_transform, data_stream, get_nsamples

__all__ = [
    "RecordStore",
    "RecordStoreWriter",
    "open_image_store",
    "ImageDataset",
    "train_transform",
    "data_stream",
    "get_nsamples",
]
