"""Native runtime: C++ host kernels bound via ctypes.

Build-on-first-import with g++ (no pybind11 in this image; plain C ABI +
ctypes).  Every native entry point has a numpy fallback, so the framework
works — just slower on the host — when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import os.path as op
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = op.dirname(op.abspath(__file__))
_SRC = op.join(_HERE, "voxelize.cpp")
_SO = op.join(_HERE, "_unetsulc_runtime.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return ctypes.CDLL(_SO)
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                "-o",
                _SO,
                _SRC,
            ],
            check=True,
            capture_output=True,
        )
        return ctypes.CDLL(_SO)
    except (subprocess.CalledProcessError, OSError) as e:
        _build_failed = True
        print(f"[unetsulc_tpu.runtime] native build failed ({e}); "
              "falling back to numpy host kernels")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            lib = _build()
            if lib is not None:
                lib.unetsulc_voxelize.restype = ctypes.c_int64
                lib.unetsulc_voxelize.argtypes = [
                    ctypes.POINTER(ctypes.c_int64),  # bck
                    ctypes.c_void_p,  # affine (double* or NULL)
                    ctypes.POINTER(ctypes.c_int32),  # labels
                    ctypes.c_int64,  # n
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int64,  # sx sy sz
                    ctypes.c_int32,  # background
                    ctypes.POINTER(ctypes.c_float),  # vol_in
                    ctypes.POINTER(ctypes.c_int32),  # vol_lb
                    ctypes.POINTER(ctypes.c_int64),  # out_coords
                ]
            _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def voxelize_native(
    bck2: np.ndarray,
    label_ids: np.ndarray,
    img_size,
    affine: Optional[np.ndarray] = None,
    background: int = -1,
):
    """Fused (affine->translate->fill->scatter) voxelization in C++.

    Returns (vol_in (X,Y,Z,1) f32, vol_lb (X,Y,Z) i32) like
    data.voxelize.voxelize; ``affine`` is an optional 3x4 homogeneous
    transform applied with trunc-toward-zero + re-translation to origin
    (the augmentation path, ref dataset.py:33-43).
    """
    lib = get_lib()
    assert lib is not None, "native runtime unavailable"
    bck = np.ascontiguousarray(bck2, dtype=np.int64).reshape(-1, 3)
    labels = np.ascontiguousarray(label_ids, dtype=np.int32)
    n = len(bck)
    sx, sy, sz = (int(s) for s in img_size)
    vol_in = np.empty((sx, sy, sz, 1), np.float32)
    vol_lb = np.empty((sx, sy, sz), np.int32)
    coords = np.empty((max(n, 1), 3), np.int64)
    aff_ptr = None
    if affine is not None:
        aff = np.ascontiguousarray(affine, dtype=np.float64).reshape(3, 4)
        aff_ptr = aff.ctypes.data_as(ctypes.c_void_p)
    lib.unetsulc_voxelize(
        bck.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        aff_ptr,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        sx,
        sy,
        sz,
        background,
        vol_in.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vol_lb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return vol_in, vol_lb
