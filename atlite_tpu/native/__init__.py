"""ctypes bindings for the C++ host geometry engine.

The shared library is built by tools/build_native.sh (plain g++ -O3); if it
is absent or fails to load, callers silently fall back to the numpy
implementations in atlite_tpu.gis.geometry.  Set ATLITE_TPU_NO_NATIVE=1 to
force the fallback (used by tests to compare both paths).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libatlite_geom.so"
_lib = None
_tried = False


def _build():
    script = _HERE.parent.parent / "tools" / "build_native.sh"
    if script.exists():
        subprocess.run(["bash", str(script)], check=True, capture_output=True)


def get_lib():
    """Load (building on first use if necessary) or return None."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("ATLITE_TPU_NO_NATIVE"):
        return None
    try:
        if not _LIB_PATH.exists():
            _build()
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.polygon_cell_areas.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.points_in_rings.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _rings_arrays(polygon):
    """Flatten a Polygon's rings to (xs, ys, sizes) contiguous arrays."""
    rings = [polygon.shell, *polygon.holes]
    xs = np.ascontiguousarray(np.concatenate([r[:, 0] for r in rings]))
    ys = np.ascontiguousarray(np.concatenate([r[:, 1] for r in rings]))
    sizes = np.asarray([len(r) for r in rings], dtype=np.int64)
    return xs, ys, sizes


def polygon_cell_areas(polygon, x0, dx, nx, y0, dy, ny, out=None):
    """|polygon ∩ cell| for every cell of a regular window; returns (ny, nx)
    float64 (accumulates into ``out`` when given).  None if lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    xs, ys, sizes = _rings_arrays(polygon)
    if out is None:
        out = np.zeros((ny, nx), dtype=np.float64)
    lib.polygon_cell_areas(
        _dp(xs), _dp(ys), sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(sizes), ctypes.c_double(x0), ctypes.c_double(dx), nx,
        ctypes.c_double(y0), ctypes.c_double(dy), ny, _dp(out),
    )
    return out


def points_in_polygon(polygon, px, py, out=None):
    """Even-odd PIP for one polygon over flat point arrays; XORs into out."""
    lib = get_lib()
    if lib is None:
        return None
    xs, ys, sizes = _rings_arrays(polygon)
    px = np.ascontiguousarray(px, dtype=np.float64)
    py = np.ascontiguousarray(py, dtype=np.float64)
    if out is None:
        out = np.zeros(px.shape, dtype=np.uint8)
    lib.points_in_rings(
        _dp(xs), _dp(ys), sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(sizes), _dp(px), _dp(py), px.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
