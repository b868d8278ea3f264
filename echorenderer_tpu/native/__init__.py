"""Native (C++) host components, loaded through ctypes.

The reference leans on native code for its hot host paths (C# JIT +
unsafe SIMD; native OIDN/Magick binaries — SURVEY.md §2b). Here the
render path is TPU kernels, and the host-side hot paths — scene
preparation (SAH BVH build) — are C++ (native/bvh_builder.cpp), compiled
on demand with g++ and cached next to the source. Everything falls back
to the numpy implementation when no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libechonative.so"
_SOURCES = ["bvh_builder.cpp"]

_lib = None
_tried = False


def _compile() -> bool:
    srcs = [str(_NATIVE_DIR / s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", str(_LIB_PATH), *srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def load():
    """Load (compiling if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        newest_src = max((_NATIVE_DIR / s).stat().st_mtime for s in _SOURCES)
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < newest_src:
            if not _compile():
                return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.build_bvh_sah.restype = ctypes.c_int32
        lib.build_bvh_sah.argtypes = [
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def build_bvh_native(aabb_min: np.ndarray, aabb_max: np.ndarray, leaf_max: int):
    """SAH build via the C++ builder. Returns the flattened arrays
    (child_min, child_max, child_code, prim_order, root_code) as numpy, or
    None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    n = int(aabb_min.shape[0])
    amin = np.ascontiguousarray(aabb_min, np.float32)
    amax = np.ascontiguousarray(aabb_max, np.float32)
    cap = max(n, 1)
    child_min = np.zeros((cap, 2, 3), np.float32)
    child_max = np.zeros((cap, 2, 3), np.float32)
    child_code = np.zeros((cap, 2), np.int32)
    prim_order = np.zeros(n, np.int32)
    node_count = ctypes.c_int32(0)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    root = lib.build_bvh_sah(
        n,
        amin.ctypes.data_as(fp),
        amax.ctypes.data_as(fp),
        int(leaf_max),
        child_min.ctypes.data_as(fp),
        child_max.ctypes.data_as(fp),
        child_code.ctypes.data_as(ip),
        prim_order.ctypes.data_as(ip),
        ctypes.byref(node_count),
    )
    k = max(int(node_count.value), 1)
    if node_count.value == 0:  # single leaf: synthesize the degenerate node
        child_code[0] = (root, root)
    return (
        child_min[:k],
        child_max[:k],
        child_code[:k],
        prim_order,
        int(root),
    )
