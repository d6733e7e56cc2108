"""ctypes bindings for the native C++ host-side runtime (native/).

Auto-builds ``libmdgen_native.so`` with g++ on first use and caches it; every
entry point has a pure-Python fallback so the framework degrades gracefully
on hosts without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(os.path.dirname(_HERE), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmdgen_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO_PATH) and os.path.isdir(_NATIVE_DIR):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_SO_PATH)
            lib.mdgen_write_xtc.restype = ctypes.c_int64
            lib.mdgen_write_xtc.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_float,
                ctypes.c_char_p,
            ]
            lib.mdgen_write_pdb_models.restype = ctypes.c_int64
            lib.mdgen_write_pdb_models.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_char_p,
                ctypes.c_char_p,
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_char_p,
                ctypes.c_int64,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def write_pdb_models(
    positions: np.ndarray,  # [T, L, 37, 3] float32
    mask: np.ndarray,  # [L, 37]
    names4: bytes,  # 37 * 4 chars
    elems: bytes,  # 37 chars
    res3: bytes,  # L * 3 chars
    res_index: np.ndarray,  # [L] int32
) -> str | None:
    """Returns the PDB text, or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, dtype=np.float32)
    mask = np.ascontiguousarray(mask, dtype=np.float32)
    res_index = np.ascontiguousarray(res_index, dtype=np.int32)
    T, L = positions.shape[:2]
    n_atoms = int((mask > 0.5).sum())
    cap = T * (n_atoms * 80 + 32) + 64
    buf = ctypes.create_string_buffer(cap)
    n = lib.mdgen_write_pdb_models(
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        names4,
        elems,
        res3,
        res_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        T,
        L,
        buf,
        cap,
    )
    if n < 0:
        return None
    return buf.raw[:n].decode("ascii")


def write_xtc(
    coords_nm: np.ndarray,  # [T, N, 3] float32, nanometers
    steps,  # [T] int32 or None
    times,  # [T] float32 or None
    precision: float,
    path: str,
) -> bool:
    """Write an XTC trajectory via the native encoder. Returns False if the
    native library is unavailable (callers fall back to the Python encoder)."""
    lib = _load()
    if lib is None:
        return False
    coords_nm = np.ascontiguousarray(coords_nm, dtype=np.float32)
    T, N = coords_nm.shape[:2]
    steps_p = None
    times_p = None
    if steps is not None:
        steps = np.ascontiguousarray(steps, dtype=np.int32)
        steps_p = steps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    if times is not None:
        times = np.ascontiguousarray(times, dtype=np.float32)
        times_p = times.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = lib.mdgen_write_xtc(
        coords_nm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        T,
        N,
        steps_p,
        times_p,
        ctypes.c_float(precision),
        path.encode(),
    )
    return rc == 0
