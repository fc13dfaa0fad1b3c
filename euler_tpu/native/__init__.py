"""Native (C++) runtime components, bound via ctypes.

Compiled lazily on first use with the system g++ into _encoder.so next to
the sources (rebuilt when the source is newer).  Import failures fall
back to the pure-Python implementations — the native layer is a runtime
accelerator, never a functional dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "encoder.cpp")
_LIB = os.path.join(_DIR, "_encoder.so")


def _build() -> str:
    if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True,
            capture_output=True,
        )
    return _LIB


_lib = None


def get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        lib.euler_encode_frame.restype = ctypes.c_long
        lib.euler_encode_frame.argtypes = [
            ctypes.c_void_p,  # glyph
            ctypes.c_void_p,  # cls
            ctypes.c_void_p,  # rgb
            ctypes.c_long,    # Y
            ctypes.c_long,    # X
            ctypes.c_long,    # wrows
            ctypes.c_long,    # wcols
            ctypes.c_int,     # rainbow
            ctypes.c_char_p,  # out
            ctypes.c_long,    # out_cap
        ]
        _lib = lib
    return _lib
