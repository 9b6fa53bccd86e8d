"""Native (C++) host-side runtime components, loaded via ctypes.

``gf2_native.cpp`` provides bit-packed GF(2) elimination used by the code
constructors (codes/gf2.py).  The shared library is built on first import
with g++ (-O3, ~1 s) and cached next to the source; if no toolchain is
available everything silently falls back to the NumPy implementation.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

__all__ = ["available", "row_echelon_native", "gf2_matmul_native"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "gf2_native.cpp")


def _lib_path() -> str:
    # the cache key is a hash of the source: a binary left over from another
    # source revision (or another machine's checkout with fresh mtimes) can
    # never be picked up, it simply has a different name
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_DIR, f"libgf2-{digest}.so")


_LIB = _lib_path()

_lib = None


def _build() -> bool:
    try:
        if os.path.exists(_LIB):
            return True
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB + ".tmp"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except Exception:  # noqa: BLE001 — no toolchain / read-only fs: fallback
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        _lib = False
        return _lib
    try:
        lib = ctypes.CDLL(_LIB)
        lib.gf2_row_echelon.restype = ctypes.c_int
        lib.gf2_row_echelon.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.gf2_matmul.restype = None
        lib.gf2_matmul.argtypes = [ctypes.POINTER(ctypes.c_uint8)] * 3 + [ctypes.c_int] * 3
        _lib = lib
    except OSError:  # pragma: no cover
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def _u8ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def row_echelon_native(mat: np.ndarray, reduced: bool = False):
    """Drop-in for codes.gf2.row_echelon (same contract, same pivot choices);
    returns None if the native library is unavailable."""
    lib = _load()
    if not lib:
        return None
    m, n = mat.shape
    work = np.ascontiguousarray(mat.astype(np.uint8) & 1)
    transform = np.zeros((m, m), np.uint8)
    pivots = np.zeros(max(n, 1), np.int32)
    rank = lib.gf2_row_echelon(
        _u8ptr(work),
        m,
        n,
        _u8ptr(transform),
        int(reduced),
        pivots.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return [work.astype(int), int(rank), transform.astype(int), pivots[:rank].tolist()]


def gf2_matmul_native(h: np.ndarray, v: np.ndarray):
    """(h @ v) % 2 on the host, bit-packed; None if unavailable."""
    lib = _load()
    if not lib:
        return None
    m, n = h.shape
    n2, b = v.shape
    assert n == n2, (h.shape, v.shape)
    hh = np.ascontiguousarray(h.astype(np.uint8) & 1)
    vv = np.ascontiguousarray(v.astype(np.uint8) & 1)
    out = np.zeros((m, b), np.uint8)
    lib.gf2_matmul(_u8ptr(hh), _u8ptr(vv), _u8ptr(out), m, n, b)
    return out.astype(int)
