"""ctypes bindings to the native C++ DTW/DBA engine (native/dtw.cpp).

The shared library is built on demand with g++ (``make native`` does the same
thing); when no compiler or prebuilt library is available every entry point
reports unavailable and callers fall back to the JAX kernels.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import typing as tp

import numpy as np

__all__ = ["available", "squared_dtw", "dtw_pairwise", "dba", "dba_batch"]

_HERE = os.path.dirname(os.path.abspath(__file__))
# The C++ source ships INSIDE the package (wheel package-data) so an
# installed copy can rebuild for its local toolchain when the bundled .so
# doesn't load.
_SRC = os.path.join(_HERE, "dtw.cpp")
_LIB = os.path.join(_HERE, "libbetdtw.so")

_lib: tp.Optional[ctypes.CDLL] = None
_tried = False


def _build(out: str = _LIB) -> bool:
    """Compile dtw.cpp to ``out`` ATOMICALLY (temp file + os.replace): a
    killed build or a concurrent reader must never observe a truncated
    .so at the canonical path."""
    if not os.path.exists(_SRC):
        return False
    tmp = f"{out}.build{os.getpid()}"
    try:
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, _SRC]
        try:
            subprocess.run(
                cmd[:2] + ["-fopenmp"] + cmd[2:],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except subprocess.SubprocessError:
            # toolchains without libgomp still get the serial build
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def _load() -> tp.Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) and not _build():
        return None

    def bind(lib: ctypes.CDLL) -> ctypes.CDLL:
        dptr = ctypes.POINTER(ctypes.c_double)
        lib.bet_squared_dtw.restype = ctypes.c_double
        lib.bet_squared_dtw.argtypes = [dptr, dptr, ctypes.c_int]
        lib.bet_dtw_pairwise.restype = None
        lib.bet_dtw_pairwise.argtypes = [dptr, ctypes.c_int, ctypes.c_int, dptr]
        lib.bet_dba.restype = None
        lib.bet_dba.argtypes = [dptr, ctypes.c_int, ctypes.c_int, ctypes.c_int, dptr]
        lib.bet_dba_batch.restype = None
        lib.bet_dba_batch.argtypes = [
            dptr, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, dptr
        ]
        return lib

    try:
        _lib = bind(ctypes.CDLL(_LIB))
    except (OSError, AttributeError):
        # OSError: corrupt/truncated .so (e.g. a killed build).
        # AttributeError: stale prebuilt library missing a newer entry
        # point.  Either way, rebuild once from source and load the result
        # through a UNIQUE pathname: glibc dlopen matches already-loaded
        # objects by pathname (before dev/inode) and ctypes never dlcloses,
        # so re-dlopening the canonical path would hand back the same stale
        # mapping (verified empirically).  Report unavailable (-> JAX
        # fallback) if the rebuild fails too.
        _lib = None
        fresh = f"{_LIB}.r{os.getpid()}"
        if _build(fresh):
            try:
                _lib = bind(ctypes.CDLL(fresh))
            except (OSError, AttributeError):
                _lib = None
            if _lib is not None:
                # Future processes get the good library at the canonical
                # path (the current mapping is unaffected by the rename).
                try:
                    os.replace(fresh, _LIB)
                except OSError:
                    pass
            else:
                try:
                    os.remove(fresh)
                except OSError:
                    pass
    return _lib


def available() -> bool:
    return _load() is not None


def _as_c(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float64)


def squared_dtw(a: np.ndarray, b: np.ndarray) -> float:
    lib = _load()
    if lib is None:
        raise RuntimeError("native DTW library unavailable")
    a, b = _as_c(a), _as_c(b)
    if a.shape != b.shape or a.ndim != 1:
        raise ValueError("equal-length 1-D series required")
    dp = ctypes.POINTER(ctypes.c_double)
    return float(
        lib.bet_squared_dtw(a.ctypes.data_as(dp), b.ctypes.data_as(dp), len(a))
    )


def dtw_pairwise(series: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native DTW library unavailable")
    s = _as_c(series)
    r, t = s.shape
    out = np.empty((r, r), dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.bet_dtw_pairwise(s.ctypes.data_as(dp), r, t, out.ctypes.data_as(dp))
    return out


def dba(series: np.ndarray, n_iterations: int = 10) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native DTW library unavailable")
    s = _as_c(series)
    r, t = s.shape
    out = np.empty((t,), dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.bet_dba(s.ctypes.data_as(dp), r, t, n_iterations, out.ctypes.data_as(dp))
    return out


def dba_batch(series: np.ndarray, n_iterations: int = 10) -> np.ndarray:
    """DBA for a whole (B, R, T) stack of models, OpenMP-parallel over B
    (medoid init, matching ``bet_dba``)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native DTW library unavailable")
    s = _as_c(series)
    b, r, t = s.shape
    out = np.empty((b, t), dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.bet_dba_batch(
        s.ctypes.data_as(dp), b, r, t, n_iterations, out.ctypes.data_as(dp)
    )
    return out
