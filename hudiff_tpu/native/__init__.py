"""Native (C++) runtime components, loaded via ctypes.

Build with ``make -C csrc`` from the repo root. Every consumer falls back to
a pure-Python implementation when the shared library is absent.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), 'libhudiff_native.so')
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.hd_align.restype = ctypes.c_int
    lib.hd_align_batch.restype = ctypes.c_int
    lib.hd_rs_open.restype = ctypes.c_void_p
    lib.hd_rs_open.argtypes = [ctypes.c_char_p]
    lib.hd_rs_len.restype = ctypes.c_int64
    lib.hd_rs_len.argtypes = [ctypes.c_void_p]
    lib.hd_rs_record_len.restype = ctypes.c_int64
    lib.hd_rs_record_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.hd_rs_get.restype = ctypes.c_int
    lib.hd_rs_get.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                              ctypes.c_void_p]
    lib.hd_rs_gather.restype = ctypes.c_int64
    lib.hd_rs_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB
