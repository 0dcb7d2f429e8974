"""Lazy build + load of the native library (ctypes, no pybind11)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_HERE, "csv_parser.cpp"),
         os.path.join(_HERE, "batch_gather.cpp")]
_LIB = os.path.join(_HERE, "libarcweld_native.so")
_lock = threading.Lock()
_lib = None
_tried = False
_load_error: str | None = None


def native_load_error() -> str | None:
    """Why the native library is unavailable (None while it is loaded
    or untried). Callers that silently fall back to a Python path use
    this to make the degradation loud (VERDICT r3: a bad .so / ABI
    drift must not silently cost the native-parse win)."""
    return _load_error


def build_native_lib(force: bool = False) -> str | None:
    """Compile the shared library if needed. Returns path or None."""
    global _load_error
    if not force and os.path.exists(_LIB) \
            and os.path.getmtime(_LIB) >= max(os.path.getmtime(s)
                                              for s in _SRCS):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", *_SRCS, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return _LIB
    except (OSError, subprocess.SubprocessError) as e:
        detail = getattr(e, "stderr", b"") or b""
        if isinstance(detail, bytes):
            detail = detail.decode(errors="replace")
        _load_error = (f"build failed ({type(e).__name__}: {e})"
                       + (f" — {detail.strip()[:200]}" if detail else ""))
        return None


def load_native_lib():
    """Returns the loaded ctypes library or None (cached)."""
    global _lib, _tried, _load_error
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = build_native_lib()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError as e:
            _load_error = f"dlopen failed ({e})"
            return None
        lib.asimow_count_rows.argtypes = [ctypes.c_char_p]
        lib.asimow_count_rows.restype = ctypes.c_int64
        lib.asimow_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.asimow_parse.restype = ctypes.c_int64
        lib.gather_rows_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.gather_rows_f32.restype = ctypes.c_int64
        _lib = lib
        return _lib
