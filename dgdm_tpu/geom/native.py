"""ctypes bindings for the native geometry kernel (native/geomkit.cpp).

Every entry point has a pure-Python fallback in ``dgdm_tpu.geom``; this module
exposes the fast native paths when the shared library is available, building
it on first use if a compiler is present.

Build manually:  python -m dgdm_tpu.geom.native
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)
_SO = os.path.join(_ROOT, "libgeomkit.so")
_SRC = os.path.join(_ROOT, "geomkit.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build() -> bool:
    try:
        subprocess.run(
            ["c++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and os.path.exists(_SRC):
        build()
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    c_d = ctypes.POINTER(ctypes.c_double)
    c_u8 = ctypes.POINTER(ctypes.c_uint8)
    c_i32 = ctypes.POINTER(ctypes.c_int32)
    c_i64 = ctypes.POINTER(ctypes.c_int64)
    lib.trace_largest_contour.restype = ctypes.c_int64
    lib.trace_largest_contour.argtypes = [
        c_u8, ctypes.c_int64, ctypes.c_int64, c_d, ctypes.c_int64,
    ]
    lib.resample_contour.restype = None
    lib.resample_contour.argtypes = [c_d, ctypes.c_int64, ctypes.c_int64, c_i32]
    lib.ear_clip.restype = ctypes.c_int64
    lib.ear_clip.argtypes = [c_d, ctypes.c_int64, c_i64]
    lib.points_in_polygon.restype = None
    lib.points_in_polygon.argtypes = [
        c_d, ctypes.c_int64, c_d, ctypes.c_int64, c_u8,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def trace_largest_contour(mask: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask != 0, dtype=np.uint8)
    h, w = mask.shape
    cap = 4 * h * w
    out = np.empty((cap, 2), dtype=np.float64)
    n = lib.trace_largest_contour(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap,
    )
    if n <= 0:
        return None
    return out[:n]


def resample_contour(xy: np.ndarray, m: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    xy = np.ascontiguousarray(xy, dtype=np.float64)
    out = np.empty((m, 2), dtype=np.int32)
    lib.resample_contour(
        xy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(xy), m,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def ear_clip(poly: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    poly = np.ascontiguousarray(poly, dtype=np.float64)
    n = len(poly)
    tris = np.empty((2 * n, 3), dtype=np.int64)
    nt = lib.ear_clip(
        poly.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return tris[:nt] if nt > 0 else None


def points_in_polygon(pts: np.ndarray, poly: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    poly = np.ascontiguousarray(poly, dtype=np.float64)
    out = np.empty(len(pts), dtype=np.uint8)
    lib.points_in_polygon(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
        poly.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(poly),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)


if __name__ == "__main__":
    ok = build()
    print("built" if ok else "build FAILED", _SO)
