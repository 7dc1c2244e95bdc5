"""ctypes bridge to the native C++ BVH builder (see bvh_builder.cpp).

Returns None from build_bvh when the shared library has not been built;
callers fall back to the numpy builder.
"""

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(__file__)
    path = os.path.join(here, "libgdpt_bvh.so")
    if not os.path.exists(path):
        # Build on first use (g++ is part of the toolchain contract).
        import subprocess

        try:
            subprocess.run(
                ["make", "-C", here], capture_output=True, timeout=120, check=False
            )
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.gdpt_build_bvh.restype = ctypes.c_int
    lib.gdpt_build_bvh.argtypes = [
        ctypes.c_int64,                  # n_prims
        ctypes.POINTER(ctypes.c_double),  # bmin (n, 3)
        ctypes.POINTER(ctypes.c_double),  # bmax (n, 3)
        ctypes.POINTER(ctypes.c_double),  # centroid (n, 3)
        ctypes.c_int, ctypes.c_int,       # leaf_size, n_bins
        ctypes.POINTER(ctypes.c_float),   # out node_bmin (2n, 3)
        ctypes.POINTER(ctypes.c_float),   # out node_bmax
        ctypes.POINTER(ctypes.c_int32),   # out first
        ctypes.POINTER(ctypes.c_int32),   # out count
        ctypes.POINTER(ctypes.c_int32),   # out miss
        ctypes.POINTER(ctypes.c_int32),   # out prim_order
    ]
    _LIB = lib
    return _LIB


def build_bvh(bmin, bmax, cent, leaf_size, n_bins):
    lib = _load()
    if lib is None:
        return None
    from gdpt_tpu.accel.bvh import BVHArrays

    n = bmin.shape[0]
    max_nodes = max(2 * n, 1)
    bmin = np.ascontiguousarray(bmin, np.float64)
    bmax = np.ascontiguousarray(bmax, np.float64)
    cent = np.ascontiguousarray(cent, np.float64)
    node_bmin = np.empty((max_nodes, 3), np.float32)
    node_bmax = np.empty((max_nodes, 3), np.float32)
    first = np.empty(max_nodes, np.int32)
    count = np.empty(max_nodes, np.int32)
    miss = np.empty(max_nodes, np.int32)
    prim_order = np.empty(n, np.int32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    n_nodes = lib.gdpt_build_bvh(
        n,
        ptr(bmin, ctypes.c_double),
        ptr(bmax, ctypes.c_double),
        ptr(cent, ctypes.c_double),
        leaf_size,
        n_bins,
        ptr(node_bmin, ctypes.c_float),
        ptr(node_bmax, ctypes.c_float),
        ptr(first, ctypes.c_int32),
        ptr(count, ctypes.c_int32),
        ptr(miss, ctypes.c_int32),
        ptr(prim_order, ctypes.c_int32),
    )
    if n_nodes <= 0:
        return None
    return BVHArrays(
        node_bmin[:n_nodes].copy(),
        node_bmax[:n_nodes].copy(),
        first[:n_nodes].copy(),
        count[:n_nodes].copy(),
        miss[:n_nodes].copy(),
        prim_order,
    )
