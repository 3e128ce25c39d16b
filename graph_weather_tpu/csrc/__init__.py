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
import sys
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "meshops.cpp")
_LIB = os.path.join(_HERE, "_meshops.so")
_lock = threading.Lock()
_lib = None
_tried = False

# Exercises khop_edges in a THROWAWAY process: a .so built on a different
# microarch (-march=native) loads fine via CDLL but can SIGILL at call
# time, which would kill this process — the subprocess absorbs the crash.
_SELFTEST = """
import ctypes, sys
import numpy as np
lib = ctypes.CDLL(sys.argv[1])
i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
lib.khop_edges.restype = ctypes.c_int64
lib.khop_edges.argtypes = [
    i32p, i32p, ctypes.c_int32, ctypes.c_int32,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
]
# Triangle graph, 2 hops, no self-loops -> 6 edges.
indptr = np.array([0, 2, 4, 6], np.int32)
indices = np.array([1, 2, 0, 2, 0, 1], np.int32)
counts = np.zeros(3, np.int64)
total = lib.khop_edges(
    indptr, indices, 3, 2, counts.ctypes.data_as(ctypes.c_void_p),
    None, None, None,
)
assert total == 6, total
assert counts.tolist() == [2, 2, 2], counts
"""


def _selftest() -> bool:
    try:
        subprocess.run(
            [sys.executable, "-c", _SELFTEST, _LIB],
            check=True,
            capture_output=True,
            timeout=60,
        )
        return True
    except Exception as e:  # noqa: BLE001
        logger.info("meshops self-test failed (%s); rebuilding", e)
        return False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # noqa: BLE001
        logger.info("meshops native build failed (%s); using numpy fallback", e)
        return False


def get_lib():
    """The loaded ctypes library, building it on first use; None on failure.

    A preexisting .so (e.g. left over from another machine) is never
    trusted blindly: it must pass the subprocess self-test, else it is
    rebuilt from source. The binary itself is not version-controlled.
    """
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        stale = (
            not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            or not _selftest()
        )
        if stale:
            if not _build() or not _selftest():
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
