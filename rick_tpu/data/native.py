"""ctypes bindings for the native C++ data loader (rickdata.cpp).

Builds `librickdata.so` on first use (g++, libpng/libjpeg) and exposes a
`NativeImageDataset` drop-in for `ImageDataset` whose batch decode runs in C++
threads.  Falls back cleanly when the toolchain is unavailable
(`native_available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "cpp", "rickdata.cpp")
_LIB_DIR = os.path.join(_HERE, "cpp", "build")
_LIB = os.path.join(_LIB_DIR, "librickdata.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", _LIB, "-lpng", "-ljpeg", "-lpthread",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            err = _build()
            if err:
                _build_error = err
                return None
        lib = ctypes.CDLL(_LIB)
        lib.rd_open.restype = ctypes.c_void_p
        lib.rd_open.argtypes = [ctypes.c_char_p]
        lib.rd_close.argtypes = [ctypes.c_void_p]
        lib.rd_count.restype = ctypes.c_int64
        lib.rd_count.argtypes = [ctypes.c_void_p]
        lib.rd_decode_batch.restype = ctypes.c_int
        lib.rd_decode_batch.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


class NativeImageDataset:
    """RecordStore-backed dataset with C++ multithreaded batch decode.

    Produces the same transform chain as `loader.train_transform` (resize
    shorter side bilinear, center crop, optional horizontal flip, [-1,1]
    CHW float32)."""

    def __init__(self, path: str, resolution: int = 256, *, flip: bool = True,
                 indices=None, n_threads: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        self._handle = lib.rd_open(path.encode())
        if not self._handle:
            raise IOError(f"cannot open record store at {path}")
        self.resolution = resolution
        self.flip = flip
        total = lib.rd_count(self._handle)
        self.indices = np.asarray(
            indices if indices is not None else np.arange(total), np.int64
        )
        self.n_threads = n_threads or min(8, os.cpu_count() or 1)

    def __len__(self):
        return len(self.indices)

    def decode_batch(self, batch_indices, rng: np.random.Generator) -> np.ndarray:
        idx = self.indices[np.asarray(batch_indices, np.int64)]
        n = len(idx)
        flips = (
            (rng.random(n) < 0.5).astype(np.uint8)
            if self.flip
            else np.zeros(n, np.uint8)
        )
        out = np.empty((n, 3, self.resolution, self.resolution), np.float32)
        rc = self._lib.rd_decode_batch(
            self._handle, np.ascontiguousarray(idx), n, self.resolution,
            flips, out.reshape(-1), self.n_threads,
        )
        if rc != 0:
            raise IOError(f"native decode failed at record {idx[rc-1]}")
        return out

    # ImageDataset-compatible single-item access
    def get(self, i: int, rng: np.random.Generator) -> np.ndarray:
        return self.decode_batch([i], rng)[0]

    def close(self):
        if self._handle:
            self._lib.rd_close(self._handle)
            self._handle = None
