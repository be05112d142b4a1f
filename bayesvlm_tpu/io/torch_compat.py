"""Bit-compatible `.pt` tensor IO without a torch dependency in the compute
path.

The reference persists every artifact with `torch.save` (Hessian factors,
feature caches, projection checkpoints). To stay drop-in compatible we read
and write the same files. torch (CPU build) is used purely as a codec when
importable; a pure-NumPy fallback reader handles the standard zipfile
serialization format so the framework still loads shipped artifacts in
torch-free deployments.
"""

from __future__ import annotations

import io
import os
import pickle
import struct
import zipfile
from pathlib import Path
from typing import Union

import numpy as np

try:  # codec only — never used in compute
    import torch

    _HAS_TORCH = True
except Exception:  # pragma: no cover
    _HAS_TORCH = False


_DTYPE_MAP = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # handled specially
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _TensorStub:
    def __init__(self, storage_key, dtype, numel):
        self.storage_key = storage_key
        self.dtype = dtype
        self.numel = numel
        self.shape = None
        self.stride = None
        self.offset = 0

    def rebuild(self, archive_reader):
        raw = archive_reader(self.storage_key)
        if self.dtype is None:  # bfloat16 -> widen to float32
            u16 = np.frombuffer(raw, dtype=np.uint16)
            arr = (u16.astype(np.uint32) << 16).view(np.float32)
        else:
            arr = np.frombuffer(raw, dtype=self.dtype)
        itemsize = arr.itemsize
        arr = arr[self.offset :]
        if self.shape is None:
            return arr.copy()
        return np.lib.stride_tricks.as_strided(
            arr,
            shape=self.shape,
            strides=tuple(s * itemsize for s in self.stride),
        ).copy()


class _PtUnpickler(pickle.Unpickler):
    """Minimal unpickler for torch-saved plain tensors (no nn.Module state)."""

    def __init__(self, file, archive_reader):
        super().__init__(file)
        self._archive_reader = archive_reader

    def find_class(self, module, name):
        if module == "torch._utils" and name in (
            "_rebuild_tensor_v2",
            "_rebuild_tensor",
        ):
            def _rebuild(storage, offset, size, stride, *args):
                storage.offset = offset
                storage.shape = tuple(size)
                storage.stride = tuple(stride)
                return storage.rebuild(self._archive_reader)

            return _rebuild
        if module == "torch" and name.endswith("Storage"):
            return name  # marker consumed by persistent_load
        if module == "collections" and name == "OrderedDict":
            import collections

            return collections.OrderedDict
        raise pickle.UnpicklingError(f"unsupported global {module}.{name}")

    def persistent_load(self, pid):
        kind, storage_type, key, _location, numel = pid
        assert kind == "storage"
        if isinstance(storage_type, str):
            name = storage_type
        else:  # torch dtype-tagged storage
            name = getattr(storage_type, "__name__", str(storage_type))
        dtype = _DTYPE_MAP.get(name, np.float32)
        return _TensorStub(key, dtype, numel)


def _load_pt_numpy(path: Path) -> np.ndarray:
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        prefix = names[0].split("/")[0]

        def read_storage(key):
            return zf.read(f"{prefix}/data/{key}")

        with zf.open(f"{prefix}/data.pkl") as f:
            obj = _PtUnpickler(f, read_storage).load()
    return obj


def load_pt_array(path: Union[str, os.PathLike]) -> np.ndarray:
    """Load a `.pt` file containing a single tensor as a NumPy array."""
    path = Path(path)
    if _HAS_TORCH:
        t = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(t, dict):
            return {k: v.numpy() for k, v in t.items()}
        if t.dtype == torch.bfloat16:
            t = t.float()
        return t.numpy()
    return _load_pt_numpy(path)


def save_pt_array(array, path: Union[str, os.PathLike]) -> None:
    """Save an array as a torch-loadable `.pt` file (reference artifact
    contract, ref:scripts/hessian_estimation.py:209-233)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = np.asarray(array)
    if _HAS_TORCH:
        buf = np.ascontiguousarray(arr)
        if not buf.flags.writeable:
            buf = buf.copy()
        torch.save(torch.from_numpy(buf), path)
        return
    _save_pt_numpy(arr, path)


def _save_pt_numpy(arr: np.ndarray, path: Path) -> None:
    """Hand-rolled torch zipfile writer for a single tensor."""
    storage_name = {
        np.dtype(np.float32): "FloatStorage",
        np.dtype(np.float64): "DoubleStorage",
        np.dtype(np.float16): "HalfStorage",
        np.dtype(np.int64): "LongStorage",
        np.dtype(np.int32): "IntStorage",
        np.dtype(np.uint8): "ByteStorage",
        np.dtype(np.bool_): "BoolStorage",
    }[arr.dtype]

    class _StoragePickler(pickle.Pickler):
        def persistent_id(self, obj):
            if isinstance(obj, _StorageRef):
                return ("storage", _FakeClass("torch", obj.name), "0", "cpu", obj.numel)
            return None

    class _FakeClass:
        def __init__(self, module, name):
            self.__module__ = module
            self.__name__ = name

        def __reduce__(self):
            return (getattr, (__import__(self.__module__), self.__name__))

    class _StorageRef:
        def __init__(self, name, numel):
            self.name = name
            self.numel = numel

    buf = io.BytesIO()
    p = _StoragePickler(buf, protocol=2)

    # emulate torch._utils._rebuild_tensor_v2(storage, 0, size, stride, False, OrderedDict())
    import collections

    contiguous = np.ascontiguousarray(arr)
    stride = tuple(s // contiguous.itemsize for s in contiguous.strides)

    class _Rebuild:
        def __reduce__(self):
            return (
                _torch_rebuild_stub,
                (
                    _StorageRef(storage_name, contiguous.size),
                    0,
                    contiguous.shape,
                    stride,
                    False,
                    collections.OrderedDict(),
                ),
            )

    p.dump(_Rebuild())
    pkl_bytes = buf.getvalue()

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", pkl_bytes)
        zf.writestr("archive/data/0", contiguous.tobytes())
        zf.writestr("archive/version", "3\n")


def _torch_rebuild_stub(*args):  # pragma: no cover - only needed by torch side
    raise RuntimeError("placeholder; real torch resolves torch._utils._rebuild_tensor_v2")


_torch_rebuild_stub.__module__ = "torch._utils"
_torch_rebuild_stub.__qualname__ = "_rebuild_tensor_v2"
_torch_rebuild_stub.__name__ = "_rebuild_tensor_v2"
