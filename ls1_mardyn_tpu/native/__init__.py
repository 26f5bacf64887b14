"""Native (C++) runtime components, bound via ctypes.

The reference's runtime is C++ throughout; the pieces that stay on the
host here (bulk phase-space I/O) get native implementations too, built
on demand with g++ and falling back to pure Python when no toolchain
is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpsio.so")
_SRC = os.path.join(_DIR, "psio.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def get_psio():
    """Returns the loaded psio library or None (fallback to Python)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
                _SRC
            ):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.psio_read_records.restype = ctypes.c_long
            lib.psio_read_records.argtypes = [
                ctypes.c_char_p,
                ctypes.c_long,
                ctypes.c_long,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.psio_write_records.restype = ctypes.c_int
            lib.psio_write_records.argtypes = [
                ctypes.c_char_p,
                ctypes.c_long,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_long),
                ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib
