"""Native host-precompute extension: build-on-first-use, numpy fallback.

Compiles meshops.cpp into a shared library with the system toolchain and
binds it via ctypes (no pybind11 dependency). If the toolchain is missing
or the build fails, callers fall back to the pure NumPy/SciPy paths.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "meshops.cpp")
_LIB = os.path.join(_HERE, "_meshops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # noqa: BLE001
        logger.info("meshops native build failed (%s); using numpy fallback", e)
        return False


def get_lib():
    """The loaded ctypes library, building it on first use; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            logger.info("meshops load failed (%s)", e)
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.khop_edges.restype = ctypes.c_int64
        lib.khop_edges.argtypes = [
            i32p, i32p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def khop_edges_native(
    senders: np.ndarray, receivers: np.ndarray, n: int, num_hops: int
) -> "tuple[np.ndarray, np.ndarray] | None":
    """K-hop expansion via the native BFS; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    order = np.argsort(senders, kind="stable")
    s = np.ascontiguousarray(senders[order], np.int32)
    r = np.ascontiguousarray(receivers[order], np.int32)
    counts = np.bincount(s, minlength=n)
    indptr = np.zeros(n + 1, np.int32)
    np.cumsum(counts, out=indptr[1:])
    indices = r

    out_counts = np.zeros(n, np.int64)
    total = lib.khop_edges(
        indptr, indices, np.int32(n), np.int32(num_hops),
        out_counts.ctypes.data_as(ctypes.c_void_p), None, None, None,
    )
    offsets = np.zeros(n, np.int64)
    np.cumsum(out_counts[:-1], out=offsets[1:])
    out_src = np.empty(total, np.int32)
    out_dst = np.empty(total, np.int32)
    lib.khop_edges(
        indptr, indices, np.int32(n), np.int32(num_hops),
        None,
        offsets.ctypes.data_as(ctypes.c_void_p),
        out_src.ctypes.data_as(ctypes.c_void_p),
        out_dst.ctypes.data_as(ctypes.c_void_p),
    )
    return out_src, out_dst
