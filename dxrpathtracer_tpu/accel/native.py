"""ctypes bridge to the native C++ LBVH builder (native/lbvh_builder.cpp).

Compiled lazily with g++ on first use and cached next to the source; falls
back to the numpy builder transparently if the toolchain is unavailable. Both
builders produce bit-identical packed arrays (cross-checked in tests), so this
is purely a host-side build-speed optimization — the reference's equivalent
native component is the D3D12 driver's acceleration-structure builder.
"""

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SRC = _NATIVE_DIR / "lbvh_builder.cpp"
_LIB = _NATIVE_DIR / "liblbvh.so"

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(_LIB)],
                check=True, capture_output=True, timeout=300)
        lib = ctypes.CDLL(str(_LIB))
        lib.lbvh_count3.restype = ctypes.c_int64
        lib.lbvh_count3.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.POINTER(ctypes.c_int64)]
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.lbvh_build3.restype = ctypes.c_int
        lib.lbvh_build3.argtypes = [f32p, f32p, f32p,
                                    ctypes.c_int64, ctypes.c_int64,
                                    f32p, ctypes.c_int64]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_packed(v0, v1, v2, leaf_size: int = 10):
    """Native build -> (table (rows,128) f32, num_rows, num_leaves, depth,
    root_code) or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    t = v0.shape[0]
    n_leaves = ctypes.c_int64(0)
    depth = ctypes.c_int64(0)
    root_code = ctypes.c_int64(0)
    n_rows = lib.lbvh_count3(t, leaf_size, ctypes.byref(n_leaves),
                             ctypes.byref(depth), ctypes.byref(root_code))
    table = np.zeros((max(n_rows, 1), 128), np.float32)
    rc = lib.lbvh_build3(v0, v1, v2, t, leaf_size, table, n_rows)
    if rc != 0:
        return None
    return table, int(n_rows), int(n_leaves.value), int(depth.value), int(root_code.value)
