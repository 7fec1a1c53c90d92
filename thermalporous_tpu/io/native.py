"""ctypes bindings for the native IO runtime (auto-built, optional).

Loads ``libtptpu_io.so``, building it with the in-tree Makefile on first
use if a C++ toolchain is present.  Every consumer falls back to the pure
Python path when the library is unavailable, so the package works on
toolchain-free machines.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "native_src")
_LIB_PATH = os.path.join(_SRC_DIR, "libtptpu_io.so")

_lib = None
_load_attempted = False


def _load():
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _SRC_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.tp_parse_floats.restype = ctypes.c_long
        lib.tp_parse_floats.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
        ]
        lib.tp_write_vti.restype = ctypes.c_int
        lib.tp_write_vti.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int,
            ctypes.c_char_p,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def parse_floats(path: str, n: int) -> np.ndarray | None:
    """Parse up to n whitespace-separated floats; None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(n, dtype=np.float64)
    got = lib.tp_parse_floats(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n
    )
    if got < 0:
        raise IOError(f"native parser could not open {path!r}")
    return out[:got]


def write_vti_raw(path: str, header: bytes, arrays: list[bytes], footer: bytes) -> bool:
    """Write a VTI file natively; False if native unavailable."""
    lib = _load()
    if lib is None:
        return False
    n = len(arrays)
    arr_ptrs = (ctypes.c_char_p * n)(*arrays)
    sizes = (ctypes.c_uint64 * n)(*[len(a) for a in arrays])
    rc = lib.tp_write_vti(path.encode(), header, arr_ptrs, sizes, n, footer)
    if rc != 0:
        raise IOError(f"native VTI writer failed with code {rc} for {path!r}")
    return True
