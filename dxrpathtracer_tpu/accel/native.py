"""ctypes bridge to the native C++ BVH builders (native/*.cpp).

Compiled lazily with g++ on first use and cached next to the source; falls
back to the numpy builders transparently if the toolchain is unavailable.
Native and numpy builders produce bit-identical packed arrays (cross-checked
in tests), so this is purely a host-side build-speed optimization — the
reference's equivalent native component is the D3D12 driver's
acceleration-structure builder (DXRPathTracer.cpp:2331-2488).

Two builders: lbvh (morton eighth-splits, fast build) and sah (binned SAH
collapsed to 8-wide, fast trace — the default).
"""

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"

_libs: dict = {}


def _compile_and_load(stem: str, extra_flags=()):
    if stem in _libs:
        return _libs[stem]
    src = _NATIVE_DIR / f"{stem}.cpp"
    so = _NATIVE_DIR / f"lib{stem}.so"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", *extra_flags, "-shared", "-fPIC", "-std=c++17",
                 str(src), "-o", str(so)],
                check=True, capture_output=True, timeout=300)
        _libs[stem] = ctypes.CDLL(str(so))
    except Exception:
        _libs[stem] = None
    return _libs[stem]


_F32P = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _load():
    lib = _compile_and_load("lbvh_builder")
    if lib is not None and not hasattr(lib, "_sigs_set"):
        lib.lbvh_count3.restype = ctypes.c_int64
        lib.lbvh_count3.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.POINTER(ctypes.c_int64)]
        lib.lbvh_build3.restype = ctypes.c_int
        lib.lbvh_build3.argtypes = [_F32P, _F32P, _F32P,
                                    ctypes.c_int64, ctypes.c_int64,
                                    _F32P, ctypes.c_int64]
        lib._sigs_set = True
    return lib


def _load_sah():
    # -ffp-contract=off: SAH cost comparisons must match the numpy mirror
    # bit-for-bit; FMA contraction would change them.
    lib = _compile_and_load("sah_builder", ("-ffp-contract=off",))
    if lib is not None and not hasattr(lib, "_sigs_set"):
        lib.sah_count3.restype = ctypes.c_int64
        lib.sah_count3.argtypes = [_F32P, _F32P, _F32P,
                                   ctypes.c_int64, ctypes.c_int64,
                                   ctypes.POINTER(ctypes.c_int64),
                                   ctypes.POINTER(ctypes.c_int64),
                                   ctypes.POINTER(ctypes.c_int64)]
        lib.sah_build3.restype = ctypes.c_int
        lib.sah_build3.argtypes = [_F32P, _F32P, _F32P,
                                   ctypes.c_int64, ctypes.c_int64,
                                   _F32P, ctypes.c_int64]
        if hasattr(lib, "sah_count_split3"):
            lib.sah_count_split3.restype = ctypes.c_int
            lib.sah_count_split3.argtypes = [
                _F32P, _F32P, _F32P, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
            lib.sah_build_split3.restype = ctypes.c_int
            lib.sah_build_split3.argtypes = [
                _F32P, _F32P, _F32P, ctypes.c_int64, ctypes.c_int64,
                _F32P, ctypes.c_int64, _F32P, ctypes.c_int64]
        if hasattr(lib, "sah_count_wide3"):
            lib.sah_count_wide3.restype = ctypes.c_int64
            lib.sah_count_wide3.argtypes = [
                _F32P, _F32P, _F32P, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64)]
            lib.sah_build_wide3.restype = ctypes.c_int
            lib.sah_build_wide3.argtypes = [
                _F32P, _F32P, _F32P, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, _F32P, ctypes.c_int64]
        lib._sigs_set = True
    return lib


def available() -> bool:
    return _load() is not None


def build_packed_sah(v0, v1, v2, leaf_size: int = 12):
    """Native SAH build -> (table (rows,128) f32, num_rows, num_leaves, depth,
    root_code) or None when unavailable."""
    lib = _load_sah()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    t = v0.shape[0]
    n_leaves = ctypes.c_int64(0)
    depth = ctypes.c_int64(0)
    root_code = ctypes.c_int64(0)
    n_rows = lib.sah_count3(v0, v1, v2, t, leaf_size, ctypes.byref(n_leaves),
                            ctypes.byref(depth), ctypes.byref(root_code))
    table = np.zeros((max(n_rows, 1), 128), np.float32)
    rc = lib.sah_build3(v0, v1, v2, t, leaf_size, table, n_rows)
    if rc != 0:
        return None
    return table, int(n_rows), int(n_leaves.value), int(depth.value), int(root_code.value)


def build_packed_sah_wide(v0, v1, v2, leaf_size: int = 12, width: int = 16):
    """Native SAH build emitting the wide bf16-internal unified layout
    (lbvh.build_table_numpy_sah_wide) -> packed tuple or None when the
    loaded library predates the export. Bit-identical to the numpy emitter
    (pinned by tests/test_native.py)."""
    lib = _load_sah()
    if lib is None or not hasattr(lib, "sah_count_wide3"):
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    t = v0.shape[0]
    n_leaves = ctypes.c_int64(0)
    depth = ctypes.c_int64(0)
    root_code = ctypes.c_int64(0)
    n_rows = lib.sah_count_wide3(v0, v1, v2, t, leaf_size, width,
                                 ctypes.byref(n_leaves), ctypes.byref(depth),
                                 ctypes.byref(root_code))
    if n_rows < 0:
        return None
    table = np.zeros((max(n_rows, 1), 128), np.float32)
    rc = lib.sah_build_wide3(v0, v1, v2, t, leaf_size, width, table, n_rows)
    if rc != 0:
        return None
    return table, int(n_rows), int(n_leaves.value), int(depth.value), int(root_code.value)


def build_packed_sah_split(v0, v1, v2, leaf_size: int = 64):
    """Native SAH build emitting the split MXU layout (lbvh.SplitBVH) ->
    (int_table, leaf_table, depth, root_code) or None when unavailable.
    Falls back to lbvh.build_split_tables_numpy_sah (bit-identical)."""
    lib = _load_sah()
    if lib is None or not hasattr(lib, "sah_count_split3"):
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    t = v0.shape[0]
    n_int = ctypes.c_int64(0)
    n_leaves = ctypes.c_int64(0)
    depth = ctypes.c_int64(0)
    root_code = ctypes.c_int64(0)
    rc = lib.sah_count_split3(v0, v1, v2, t, leaf_size, ctypes.byref(n_int),
                              ctypes.byref(n_leaves), ctypes.byref(depth),
                              ctypes.byref(root_code))
    if rc != 0:
        return None
    int_table = np.zeros((max(n_int.value, 1), 64), np.float32)
    leaf_table = np.zeros((max(n_leaves.value, 1), 10 * leaf_size + 8),
                          np.float32)
    rc = lib.sah_build_split3(v0, v1, v2, t, leaf_size, int_table,
                              n_int.value, leaf_table, n_leaves.value)
    if rc != 0:
        return None
    return int_table, leaf_table, int(depth.value), int(root_code.value)


def build_packed(v0, v1, v2, leaf_size: int = 12):
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
