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


_SO_LZ4 = os.path.join(_DIR, "liblz4f.so")
_SRC_LZ4 = os.path.join(_DIR, "lz4f.cpp")
_lz4 = None
_lz4_tried = False


def get_lz4():
    """Returns the native LZ4-frame codec library or None."""
    global _lz4, _lz4_tried
    with _lock:
        if _lz4 is not None or _lz4_tried:
            return _lz4
        _lz4_tried = True
        try:
            if not os.path.exists(_SO_LZ4) or os.path.getmtime(
                _SO_LZ4
            ) < os.path.getmtime(_SRC_LZ4):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", _SO_LZ4,
                     _SRC_LZ4],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO_LZ4)
            for fn in ("lz4f_compress", "lz4f_decompress"):
                f = getattr(lib, fn)
                f.restype = ctypes.c_long
                f.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_long,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_long,
                ]
            _lz4 = lib
        except Exception:
            _lz4 = None
        return _lz4


def lz4_compress(data: bytes) -> bytes:
    lib = get_lz4()
    if lib is None:
        raise RuntimeError("native lz4 codec unavailable (g++ missing?)")
    n = len(data)
    cap = 16 + n + n // 255 + (n // (1 << 22) + 1) * 8 + 64
    out = (ctypes.c_uint8 * cap)()
    got = lib.lz4f_compress(data, n, out, cap)
    if got < 0:
        raise RuntimeError("lz4 compression overflow")
    return bytes(bytearray(out)[:got])


def lz4_decompress(data: bytes, max_out: int = 0) -> bytes:
    lib = get_lz4()
    if lib is None:
        raise RuntimeError("native lz4 codec unavailable (g++ missing?)")
    cap = max_out or max(64, 64 * len(data))
    while True:
        out = (ctypes.c_uint8 * cap)()
        got = lib.lz4f_decompress(data, len(data), out, cap)
        if got >= 0:
            return bytes(bytearray(out)[:got])
        if max_out or cap > (1 << 33):
            raise RuntimeError("lz4 decompression failed")
        cap *= 4
