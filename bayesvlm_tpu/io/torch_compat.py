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
        if name not in _DTYPE_MAP:
            # find_class raises loudly on unsupported globals; be equally
            # loud here — a silent float32 fallback would reinterpret the
            # raw bytes of e.g. a ComplexFloatStorage as garbage floats.
            raise pickle.UnpicklingError(f"unsupported torch storage type {name}")
        return _TensorStub(key, _DTYPE_MAP[name], numel)


def _load_pt_numpy(path: Path) -> np.ndarray:
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        prefix = names[0].split("/")[0]

        def read_storage(key):
            return zf.read(f"{prefix}/data/{key}")

        with zf.open(f"{prefix}/data.pkl") as f:
            obj = _PtUnpickler(f, read_storage).load()
    return obj


def _torch_to_numpy(obj):
    """Recursively convert torch tensors to NumPy (bf16 widens to fp32),
    preserving dict nesting/key order — state_dicts may nest."""
    if isinstance(obj, dict):
        return type(obj)((k, _torch_to_numpy(v)) for k, v in obj.items())
    if _HAS_TORCH and isinstance(obj, torch.Tensor):
        if obj.dtype == torch.bfloat16:
            obj = obj.float()
        return obj.numpy()
    return obj


def load_pt_array(path: Union[str, os.PathLike]) -> np.ndarray:
    """Load a `.pt` file containing a single tensor as a NumPy array,
    or a (possibly nested) state_dict as a dict of NumPy arrays."""
    path = Path(path)
    if _HAS_TORCH:
        return _torch_to_numpy(
            torch.load(path, map_location="cpu", weights_only=True))
    return _load_pt_numpy(path)


def save_pt_array(array, path: Union[str, os.PathLike]) -> None:
    """Save an array as a torch-loadable `.pt` file (reference artifact
    contract, ref:scripts/hessian_estimation.py:209-233)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = np.asarray(array)
    if _HAS_TORCH:
        buf = np.asarray(arr, order="C")
        if not buf.flags.writeable:
            buf = buf.copy()
        torch.save(torch.from_numpy(buf), path)
        return
    _save_pt_numpy(arr, path)


def save_pt_state_dict(state: dict, path: Union[str, os.PathLike]) -> None:
    """Save {name: array} as a torch state_dict `.pt` — the reference's
    `torch.save(module.state_dict())` checkpoint contract
    (ref:scripts/activelearning.py:657-660)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    def _prep(v):
        if isinstance(v, dict):
            return {k: _prep(x) for k, x in v.items()}
        return np.asarray(v, order="C")

    arrays = _prep(state)
    if _HAS_TORCH:
        def _to_torch(v):
            if isinstance(v, dict):
                return {k: _to_torch(x) for k, x in v.items()}
            if not v.flags.writeable:
                v = v.copy()
            return torch.from_numpy(v)

        torch.save(_to_torch(arrays), path)
        return
    _save_pt_numpy_dict(arrays, path)


_STORAGE_NAMES = {
    np.dtype(np.float32): "FloatStorage",
    np.dtype(np.float64): "DoubleStorage",
    np.dtype(np.float16): "HalfStorage",
    np.dtype(np.int64): "LongStorage",
    np.dtype(np.int32): "IntStorage",
    np.dtype(np.int16): "ShortStorage",
    np.dtype(np.int8): "CharStorage",
    np.dtype(np.uint8): "ByteStorage",
    np.dtype(np.bool_): "BoolStorage",
}


def _torch_global(module: str, name: str):
    """A stand-in class whose pickled form is the GLOBAL `module.name`.

    The writer must emit torch globals BY NAME: pickling the real torch
    objects by reference is impossible without torch, and pickling local
    stand-ins by reference trips pickle's identity check when torch IS
    importable (observed: the old stub-function approach failed both
    ways). _PtWriterPickler.save_global below writes these markers as
    plain GLOBAL opcodes, which both torch.load(weights_only=True) and
    _PtUnpickler.find_class resolve."""
    cls = type(name, (), {})
    cls.__module__ = module
    cls.__qualname__ = name
    return cls


class _StorageRef:
    def __init__(self, name, key, numel):
        self.name = name
        self.key = key
        self.numel = numel


class _Rebuild:
    """Pickles as torch._utils._rebuild_tensor_v2(storage, 0, shape,
    stride, False, OrderedDict()) — torch's plain-tensor wire form."""

    def __init__(self, arr, key):
        self.arr = arr
        self.key = key

    def __reduce__(self):
        import collections

        stride = tuple(s // self.arr.itemsize for s in self.arr.strides)
        return (
            _torch_global("torch._utils", "_rebuild_tensor_v2"),
            (
                _StorageRef(_STORAGE_NAMES[self.arr.dtype], self.key,
                            self.arr.size),
                0,
                self.arr.shape,
                stride,
                False,
                collections.OrderedDict(),
            ),
        )


class _PtWriterPickler(pickle._Pickler):
    # the pure-Python pickler: the C implementation ignores a Python
    # save_global override, which is the whole point here
    def persistent_id(self, obj):
        if isinstance(obj, _StorageRef):
            return ("storage", _torch_global("torch", obj.name), obj.key,
                    "cpu", obj.numel)
        return None

    def save_global(self, obj, name=None):
        module = getattr(obj, "__module__", None)
        if module in ("torch", "torch._utils"):
            # by-name GLOBAL, no import/identity check at save time
            self.write(pickle.GLOBAL
                       + f"{module}\n{obj.__qualname__}\n".encode())
            self.memoize(obj)
            return
        super().save_global(obj, name)


def _write_pt_zip(payload, storages: dict, path: Path) -> None:
    buf = io.BytesIO()
    _PtWriterPickler(buf, protocol=2).dump(payload)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        for key, arr in storages.items():
            zf.writestr(f"archive/data/{key}", arr.tobytes())
        zf.writestr("archive/version", "3\n")


def _save_pt_numpy_dict(arrays: dict, path: Path) -> None:
    """Hand-rolled torch zipfile writer for a {name: tensor} dict
    (state_dict contract); dicts may nest."""
    import collections

    storages = {}

    def _build(v):
        if isinstance(v, dict):
            return collections.OrderedDict(
                (k, _build(x)) for k, x in v.items())
        arr = np.asarray(v, order="C")
        key = str(len(storages))
        storages[key] = arr
        return _Rebuild(arr, key)

    _write_pt_zip(_build(arrays), storages, path)


def _save_pt_numpy(arr: np.ndarray, path: Path) -> None:
    """Hand-rolled torch zipfile writer for a single tensor."""
    contiguous = np.asarray(arr, order="C")
    _write_pt_zip(_Rebuild(contiguous, "0"), {"0": contiguous}, path)
