"""Read/write torch zip-format `.pt` files with the stdlib only.

Format (torch >= 1.6 default): a zip archive containing
    <name>/data.pkl      -- pickle stream; tensors appear as persistent ids
                            ('storage', <StorageType>, key, location, numel)
                            rebuilt via torch._utils._rebuild_tensor_v2
    <name>/data/<key>    -- raw little-endian storage bytes
    <name>/version

Reading: a custom Unpickler maps storages to numpy arrays and stubs the torch
classes the pickle references.  Writing: we emit the same structure so that
actual torch (`torch.load`) on the reference side can read our checkpoints.

Also reads the legacy (pre-zip) torch serialization used by e.g. the
reference's `gan_metrics/models/lenet.pth`.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from collections import OrderedDict
from typing import Any, Dict

import numpy as np

_DTYPE_BY_STORAGE = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially
}

_STORAGE_BY_DTYPE = {
    np.dtype(np.float32): ("FloatStorage", 4),
    np.dtype(np.float64): ("DoubleStorage", 8),
    np.dtype(np.float16): ("HalfStorage", 2),
    np.dtype(np.int64): ("LongStorage", 8),
    np.dtype(np.int32): ("IntStorage", 4),
    np.dtype(np.int16): ("ShortStorage", 2),
    np.dtype(np.int8): ("CharStorage", 1),
    np.dtype(np.uint8): ("ByteStorage", 1),
    np.dtype(np.bool_): ("BoolStorage", 1),
}


class _StorageStub:
    """Stands in for a torch storage: raw bytes + element dtype."""

    def __init__(self, name: str, data: bytes):
        self.name = name
        self.data = data

    def to_numpy(self) -> np.ndarray:
        if self.name == "BFloat16Storage":
            u16 = np.frombuffer(self.data, dtype=np.uint16)
            u32 = u16.astype(np.uint32) << 16
            return u32.view(np.float32)
        dtype = _DTYPE_BY_STORAGE[self.name]
        return np.frombuffer(self.data, dtype=dtype)


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad=False, backward_hooks=None, metadata=None):
    flat = storage.to_numpy()
    if not size:
        return flat[storage_offset].copy()
    # materialize via as_strided on the flat buffer (element strides)
    arr = np.lib.stride_tricks.as_strided(
        flat[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * flat.itemsize for s in stride),
    )
    return np.ascontiguousarray(arr)


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


class _TorchClassStub:
    """Generic callable stub for torch classes referenced by the pickle."""

    def __init__(self, module, name):
        self.module, self.name = module, name

    def __call__(self, *args, **kwargs):  # e.g. torch.Size(...)
        if self.name == "Size":
            return tuple(args[0]) if args else ()
        return args

    def __repr__(self):
        return f"<stub {self.module}.{self.name}>"


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, storage_lookup):
        super().__init__(file, encoding="latin1")
        self._storage_lookup = storage_lookup

    def persistent_load(self, pid):
        typename = pid[0]
        if typename != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        storage_type, key, _location, _numel = pid[1], pid[2], pid[3], pid[4]
        name = getattr(storage_type, "name", None) or str(storage_type)
        return _StorageStub(name, self._storage_lookup(str(key)))

    def find_class(self, module, name):
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "collections":
            return getattr(__import__("collections"), name)
        if module.startswith("torch"):
            if name.endswith("Storage"):
                stub = _TorchClassStub(module, name)
                stub.name = name
                return stub
            return _TorchClassStub(module, name)
        if module in ("numpy", "numpy.core.multiarray", "numpy._core.multiarray"):
            return super().find_class(module, name)
        if module == "__builtin__" or module == "builtins":
            return super().find_class("builtins", name)
        raise pickle.UnpicklingError(f"blocked class {module}.{name}")


def _load_zip(path: str) -> Any:
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]
        data = {}
        for n in names:
            if n.startswith(prefix + "data/"):
                data[n[len(prefix + "data/") :]] = zf.read(n)

        def lookup(key):
            return data[key]

        with zf.open(pkl_name) as f:
            return _Unpickler(io.BytesIO(f.read()), lookup).load()


class _LazyTensor:
    """Placeholder for a tensor whose storage bytes arrive after the pickle
    stream (legacy torch serialization); materialized in a post-pass."""

    def __init__(self, storage, offset, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = size
        self.stride = stride

    def materialize(self):
        return _rebuild_tensor_v2(self.storage, self.offset, self.size, self.stride)


def _resolve_lazy(obj):
    if isinstance(obj, _LazyTensor):
        return obj.materialize()
    if isinstance(obj, OrderedDict):
        return OrderedDict((k, _resolve_lazy(v)) for k, v in obj.items())
    if isinstance(obj, dict):
        return {k: _resolve_lazy(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_resolve_lazy(v) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_resolve_lazy(v) for v in obj)
    return obj


def _load_legacy(path: str) -> Any:
    """Legacy torch serialization: magic pickle + sys_info + main pickle with
    storage persistent ids, followed by per-storage payloads (8-byte count +
    raw data each, keyed by a trailing key list).  Tensor materialization is
    deferred until the payloads are read."""
    with open(path, "rb") as f:
        magic = pickle.load(f)
        if magic != 0x1950A86A20F9469CFC6C:
            raise ValueError(f"{path}: not a legacy torch file")
        pickle.load(f)  # protocol_version
        pickle.load(f)  # sys_info

        storages: Dict[str, _StorageStub] = {}

        def _lazy_rebuild(storage, offset, size, stride, *rest):
            return _LazyTensor(storage, offset, size, stride)

        class LegacyUnpickler(_Unpickler):
            def persistent_load(self, pid):
                typename = pid[0]
                if typename == "storage":
                    storage_type, key, _loc, numel, *_ = pid[1:]
                    name = getattr(storage_type, "name", None) or str(storage_type)
                    if str(key) not in storages:
                        storages[str(key)] = _StorageStub(name, b"")
                    return storages[str(key)]
                if typename == "module":
                    return pid[1]
                raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")

            def find_class(self, module, name):
                if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
                    return _lazy_rebuild
                return super().find_class(module, name)

        result = LegacyUnpickler(f, lambda k: b"").load()

        # deserialized storage keys list, then per-storage payloads
        keys = pickle.load(f)
        for key in keys:
            (numel,) = struct.unpack("<q", f.read(8))
            stub = storages[str(key)]
            if stub.name == "BFloat16Storage":
                itemsize = 2
            else:
                itemsize = np.dtype(_DTYPE_BY_STORAGE[stub.name]).itemsize
            stub.data = f.read(numel * itemsize)
        return _resolve_lazy(result)


def load_torch_file(path: str) -> Any:
    """Load a torch-serialized file into numpy-backed python objects.

    Tensors become np.ndarray; dicts/OrderedDicts/lists pass through.
    """
    if zipfile.is_zipfile(path):
        return _load_zip(path)
    return _load_legacy(path)


# ---------------------------------------------------------------------------
# Writing: hand-rolled protocol-2 pickle emitter (mirrors torch's own opcode
# stream exactly, validated against `pickletools.dis(torch.save(...))`).
# ---------------------------------------------------------------------------


class _PickleWriter:
    def __init__(self):
        self.out = io.BytesIO()
        self.out.write(b"\x80\x02")  # PROTO 2

    def unicode(self, s: str):
        b = s.encode("utf-8")
        self.out.write(b"X" + struct.pack("<I", len(b)) + b)  # BINUNICODE

    def int(self, v: int):
        if 0 <= v < 256:
            self.out.write(b"K" + struct.pack("<B", v))  # BININT1
        elif 0 <= v < 65536:
            self.out.write(b"M" + struct.pack("<H", v))  # BININT2
        elif -(2**31) <= v < 2**31:
            self.out.write(b"J" + struct.pack("<i", v))  # BININT
        else:
            # LONG1 encoding
            nb = (v.bit_length() + 8) // 8
            self.out.write(b"\x8a" + struct.pack("<B", nb) + v.to_bytes(nb, "little", signed=True))

    def float(self, v: float):
        self.out.write(b"G" + struct.pack(">d", v))  # BINFLOAT

    def bool(self, v: bool):
        self.out.write(b"\x88" if v else b"\x89")  # NEWTRUE / NEWFALSE

    def none(self):
        self.out.write(b"N")

    def global_(self, module: str, name: str):
        self.out.write(b"c" + module.encode() + b"\n" + name.encode() + b"\n")

    def mark(self):
        self.out.write(b"(")

    def tuple_(self):
        self.out.write(b"t")

    def empty_tuple(self):
        self.out.write(b")")

    def reduce(self):
        self.out.write(b"R")

    def binpersid(self):
        self.out.write(b"Q")

    def empty_dict(self):
        self.out.write(b"}")

    def setitems(self):
        self.out.write(b"u")

    def empty_list(self):
        self.out.write(b"]")

    def appends(self):
        self.out.write(b"e")

    def stop(self):
        self.out.write(b".")

    def int_tuple(self, vals):
        self.mark()
        for v in vals:
            self.int(int(v))
        self.tuple_()


def _emit(w: _PickleWriter, obj, storages: Dict[str, bytes]):
    if isinstance(obj, np.ndarray):
        arr = np.ascontiguousarray(obj)
        if arr.dtype == np.float64:
            arr = arr.astype(np.float32)
        if arr.dtype not in _STORAGE_BY_DTYPE:
            raise TypeError(f"unsupported dtype {arr.dtype}")
        storage_name, _ = _STORAGE_BY_DTYPE[arr.dtype]
        key = str(len(storages))
        storages[key] = arr.tobytes()

        w.global_("torch._utils", "_rebuild_tensor_v2")
        w.mark()
        # persistent id tuple
        w.mark()
        w.unicode("storage")
        w.global_("torch", storage_name)
        w.unicode(key)
        w.unicode("cpu")
        w.int(arr.size)
        w.tuple_()
        w.binpersid()
        w.int(0)  # storage offset
        w.int_tuple(arr.shape)
        w.int_tuple([s // arr.itemsize for s in arr.strides] if arr.size else [1] * arr.ndim)
        w.bool(False)  # requires_grad
        w.global_("collections", "OrderedDict")
        w.empty_tuple()
        w.reduce()
        w.tuple_()  # close args MARK
        w.reduce()
    elif isinstance(obj, dict):
        w.empty_dict()
        if obj:
            w.mark()
            for k, v in obj.items():
                _emit(w, k, storages)
                _emit(w, v, storages)
            w.setitems()
    elif isinstance(obj, (list, tuple)):
        if isinstance(obj, tuple):
            w.mark()
            for v in obj:
                _emit(w, v, storages)
            w.tuple_()
        else:
            w.empty_list()
            if obj:
                w.mark()
                for v in obj:
                    _emit(w, v, storages)
                w.appends()
    elif isinstance(obj, str):
        w.unicode(obj)
    elif isinstance(obj, bool) or isinstance(obj, np.bool_):
        w.bool(bool(obj))
    elif isinstance(obj, (int, np.integer)):
        w.int(int(obj))
    elif isinstance(obj, (float, np.floating)):
        w.float(float(obj))
    elif obj is None:
        w.none()
    else:
        raise TypeError(f"cannot serialize {type(obj)!r} into a torch .pt file")


def save_torch_file(obj: Any, path: str, archive_name: str = "archive") -> None:
    """Serialize nested dicts/lists of numpy arrays (+ scalars/strings/None) as
    a torch zip `.pt` file readable by `torch.load` (weights_only-safe)."""
    storages: Dict[str, bytes] = {}
    w = _PickleWriter()
    _emit(w, obj, storages)
    w.stop()

    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{archive_name}/data.pkl", w.out.getvalue())
        for key, blob in storages.items():
            zf.writestr(f"{archive_name}/data/{key}", blob)
        zf.writestr(f"{archive_name}/version", "3\n")
