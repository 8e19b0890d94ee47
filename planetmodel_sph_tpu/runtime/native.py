"""Build/load the native runtime library (ctypes, lazy g++ compile)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "psph_io.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def lib_path() -> str:
    return os.path.join(_HERE, "_psph_io.so")


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", lib_path()]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(lib_path()) or (
                os.path.getmtime(lib_path()) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(lib_path())
        except OSError:
            return None
        lib.psph_writer_open.restype = ctypes.c_void_p
        lib.psph_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.psph_writer_write.restype = ctypes.c_int
        lib.psph_writer_write.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                          ctypes.c_uint64]
        lib.psph_writer_close.restype = ctypes.c_int
        lib.psph_writer_close.argtypes = [ctypes.c_void_p]
        lib.psph_reader_open.restype = ctypes.c_void_p
        lib.psph_reader_open.argtypes = [ctypes.c_char_p]
        lib.psph_reader_header.restype = ctypes.c_int64
        lib.psph_reader_header.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                           ctypes.c_uint64]
        lib.psph_reader_next.restype = ctypes.c_int64
        lib.psph_reader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                         ctypes.c_uint64]
        lib.psph_reader_close.restype = ctypes.c_int
        lib.psph_reader_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def available() -> bool:
    return load() is not None
