"""Native (C++) host-runtime components, loaded via ctypes.

Build happens lazily on first use (g++ -O3 -shared); all callers fall
back to pure-Python paths when no compiler is available, so the
framework never hard-requires the native library.
"""
from .build import load_native_lib
from .csv_loader import parse_asimow_csv_native, native_available
