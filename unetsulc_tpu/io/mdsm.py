"""Torch-free reader/writer for ``.mdsm`` checkpoints (PyTorch state_dicts).

The reference persists models as ``torch.save(model.state_dict(), *.mdsm)``
(ref pattern_class.py:295-305) and transfer learning starts from BrainVISA's
pretrained human ``.mdsm`` files (ref transfer_learning/transfer_learning.py:
155-168), so this format is a hard public contract (SURVEY.md §7 hard part
#1).  This module implements it without importing torch:

* **read_state_dict** — parses the torch ZIP container (``archive/data.pkl``
  + ``archive/data/<key>`` storage blobs) with a restricted Unpickler:
  ``find_class`` only admits the torch serialization helpers it models
  (``_rebuild_tensor_v2`` etc.) and ``persistent_load`` resolves
  ``('storage', <TypeStorage>, key, location, numel)`` tuples to numpy
  arrays read from the archive.  Non-zip legacy files fall back to torch
  when it happens to be importable.
* **write_state_dict** — emits the same ZIP container with a hand-rolled
  pickle stream (protocol 2 opcodes), loadable by stock ``torch.load``.

Tensors are represented as numpy arrays keyed by the torch parameter names
(``encoders.0.double_conv.conv1.weight`` ...); mapping to/from the flax
pytree lives in :mod:`unetsulc_tpu.models.torch_interop`.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Dict, Tuple

import numpy as np

try:  # bfloat16 support without torch
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("?"),
}
if _BFLOAT16 is not None:
    _STORAGE_DTYPES["BFloat16Storage"] = _BFLOAT16

_DTYPE_STORAGE = {v: k for k, v in _STORAGE_DTYPES.items()}


class _StorageRef:
    __slots__ = ("dtype", "key")

    def __init__(self, dtype, key):
        self.dtype = dtype
        self.key = key


class _StorageType:
    """Stand-in for torch.FloatStorage & co. during unpickling."""

    def __init__(self, name):
        self.name = name


def _rebuild_tensor_v2(
    storage, storage_offset, size, stride, requires_grad=False, backward_hooks=None,
    metadata=None,
):
    arr, dtype = storage
    itemsize = dtype.itemsize
    if not size:
        return arr[storage_offset : storage_offset + 1].reshape(())
    # contiguous fast path
    contiguous = True
    acc = 1
    for s, st in zip(reversed(size), reversed(stride)):
        if st != acc:
            contiguous = False
            break
        acc *= s
    n = int(np.prod(size))
    if contiguous:
        return arr[storage_offset : storage_offset + n].reshape(size)
    return np.lib.stride_tricks.as_strided(
        arr[storage_offset:],
        shape=tuple(size),
        strides=tuple(st * itemsize for st in stride),
    ).copy()


def _rebuild_tensor(storage, storage_offset, size, stride):
    return _rebuild_tensor_v2(storage, storage_offset, size, stride)


class _Unpickler(pickle.Unpickler):
    """Restricted unpickler resolving torch globals to local equivalents."""

    def __init__(self, file, storages: Dict[str, Tuple[np.ndarray, np.dtype]]):
        super().__init__(file)
        self._storages = storages

    def find_class(self, module, name):
        if name in _STORAGE_DTYPES and module.startswith("torch"):
            return _StorageType(name)
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_tensor":
            return _rebuild_tensor
        if module == "collections" and name == "OrderedDict":
            return dict
        if module == "torch" and name == "Size":
            return tuple
        if (module, name) in (
            ("torch.serialization", "_get_layout"),
            ("torch", "device"),
        ):
            return lambda *a, **k: None
        raise pickle.UnpicklingError(
            f"blocked global in .mdsm: {module}.{name}"
        )

    def persistent_load(self, pid):
        typename = pid[0]
        if typename != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        storage_type, key, _location, _numel = pid[1:5]
        if isinstance(storage_type, _StorageType):
            dtype = _STORAGE_DTYPES[storage_type.name]
        else:  # torch.UntypedStorage path: dtype resolved at rebuild
            dtype = np.dtype("u1")
        raw, _ = self._storages[str(key)]
        return (raw.view(dtype), dtype)


def read_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into {name: numpy array}."""
    import os

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path}: no such checkpoint. Note: the CV driver saves per-fold "
            "models (models/<name>/<name>_cvK_model.mdsm); a global "
            "<name>_model.mdsm only exists if save_model() was called "
            "without a fold name (same as the reference)."
        )
    if not zipfile.is_zipfile(path):
        return _read_legacy_with_torch(path)
    with zipfile.ZipFile(path, "r") as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl"))
        root = pkl_name[: -len("data.pkl")]
        storages: Dict[str, Tuple[np.ndarray, np.dtype]] = {}
        for n in names:
            if n.startswith(root + "data/"):
                key = n[len(root + "data/") :]
                raw = np.frombuffer(zf.read(n), dtype=np.uint8)
                storages[key] = (raw, np.dtype("u1"))
        with zf.open(pkl_name) as f:
            obj = _Unpickler(io.BytesIO(f.read()), storages).load()
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state_dict, got {type(obj)}")
    return {str(k): np.asarray(v) for k, v in obj.items()}


def _read_legacy_with_torch(path: str) -> Dict[str, np.ndarray]:
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ValueError(
            f"{path} is a legacy (non-zip) torch checkpoint; converting it "
            "requires torch. Re-save it with a modern torch or use "
            "write_state_dict()."
        ) from e
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


# --------------------------------------------------------------------------
# Writer: hand-rolled pickle stream, torch.load-compatible.
# --------------------------------------------------------------------------


class _PickleWriter:
    def __init__(self):
        self.out = bytearray()
        self.out += b"\x80\x02"  # PROTO 2

    def global_(self, module: str, name: str):
        self.out += b"c" + module.encode() + b"\n" + name.encode() + b"\n"

    def mark(self):
        self.out += b"("

    def tuple_(self):
        self.out += b"t"  # TUPLE (from mark)

    def empty_tuple(self):
        self.out += b")"

    def tuple2(self):
        self.out += b"\x86"

    def reduce(self):
        self.out += b"R"

    def empty_dict(self):
        self.out += b"}"

    def setitems(self):
        self.out += b"u"  # SETITEMS (from mark)

    def binpersid(self):
        self.out += b"Q"

    def stop(self):
        self.out += b"."

    def unicode_(self, s: str):
        b = s.encode("utf-8")
        self.out += b"X" + struct.pack("<I", len(b)) + b  # BINUNICODE (proto 2)

    def int_(self, v: int):
        if 0 <= v < 256:
            self.out += b"K" + struct.pack("<B", v)
        elif 0 <= v < 65536:
            self.out += b"M" + struct.pack("<H", v)
        else:
            self.out += b"J" + struct.pack("<i", v)

    def bool_(self, v: bool):
        self.out += b"\x88" if v else b"\x89"

    def int_tuple(self, values):
        if len(values) == 0:
            self.empty_tuple()
            return
        self.mark()
        for v in values:
            self.int_(int(v))
        self.tuple_()


def _contiguous_strides(shape) -> Tuple[int, ...]:
    strides = []
    acc = 1
    for s in reversed(shape):
        strides.append(acc)
        acc *= s
    return tuple(reversed(strides))


def write_state_dict(state: Dict[str, np.ndarray], path: str) -> None:
    """Write {name: array} as a torch.load-compatible zip checkpoint."""
    w = _PickleWriter()
    # state dict object: collections.OrderedDict()
    w.global_("collections", "OrderedDict")
    w.empty_tuple()
    w.reduce()
    w.mark()
    blobs = []
    for i, (key, arr) in enumerate(state.items()):
        arr = np.ascontiguousarray(arr)
        dt = arr.dtype
        if dt == np.dtype("float64"):
            # torch state_dicts are fp32 by convention; keep dtype faithful
            storage_name = "DoubleStorage"
        else:
            storage_name = _DTYPE_STORAGE.get(dt.newbyteorder("<"))
            if storage_name is None:
                storage_name = _DTYPE_STORAGE.get(dt)
            if storage_name is None:
                raise ValueError(f"unsupported dtype for .mdsm: {dt}")
        w.unicode_(key)
        # torch._utils._rebuild_tensor_v2(pers_storage, 0, size, stride,
        #                                 False, OrderedDict())
        w.global_("torch._utils", "_rebuild_tensor_v2")
        w.mark()
        #   persistent id tuple ('storage', torch.<T>Storage, key, 'cpu', numel)
        w.mark()
        w.unicode_("storage")
        w.global_("torch", storage_name)
        w.unicode_(str(i))
        w.unicode_("cpu")
        w.int_(arr.size)
        w.tuple_()
        w.binpersid()
        w.int_(0)
        w.int_tuple(arr.shape)
        w.int_tuple(_contiguous_strides(arr.shape))
        w.bool_(False)
        w.global_("collections", "OrderedDict")
        w.empty_tuple()
        w.reduce()
        w.tuple_()
        w.reduce()
        blobs.append((str(i), arr))
    w.setitems()
    w.stop()

    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", bytes(w.out))
        zf.writestr("archive/byteorder", "little")
        for key, arr in blobs:
            zf.writestr(f"archive/data/{key}", arr.astype(arr.dtype.newbyteorder("<"), copy=False).tobytes())
        zf.writestr("archive/version", "3\n")
