"""ctypes bindings for the native (C++) tokenizer engine.

The library is built on demand with `make` (g++); if the toolchain or build
fails, callers fall back to the pure-Python implementation transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "liblmrs_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _DIR], check=True,
                               capture_output=True, timeout=120)
            except (subprocess.SubprocessError, OSError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.lmrs_tok_from_buffer.restype = ctypes.c_void_p
        lib.lmrs_tok_from_buffer.argtypes = [ctypes.c_char_p,
                                             ctypes.c_uint64]
        lib.lmrs_tok_free.argtypes = [ctypes.c_void_p]
        lib.lmrs_tok_merge.restype = ctypes.c_int64
        lib.lmrs_tok_merge.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_uint32),
                                       ctypes.c_int64]
        lib.lmrs_tok_lookup.restype = ctypes.c_int64
        lib.lmrs_tok_lookup.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_uint64]
        lib.lmrs_q4_repack.restype = None
        lib.lmrs_q4_repack.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_uint64, ctypes.c_uint32]
        _lib = lib
        return _lib


def q4_repack(src, group_size: int):
    """C++ file→runtime Q4 repack; returns a new uint8 array of src's shape,
    or None when the native library is unavailable."""
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src).view(np.uint8)
    dst = np.empty_like(src)
    lib.lmrs_q4_repack(src.ctypes.data_as(ctypes.c_void_p),
                       dst.ctypes.data_as(ctypes.c_void_p),
                       src.size, group_size)
    return dst


class NativeTokenizerEngine:
    """Wraps a tokenizer.bin image parsed by the C++ engine."""

    def __init__(self, container_bytes: bytes):
        lib = _load()
        if lib is None:
            raise RuntimeError("native tokenizer library unavailable")
        self._lib = lib
        self._buf = container_bytes  # keep alive
        self._handle = lib.lmrs_tok_from_buffer(container_bytes,
                                                len(container_bytes))
        if not self._handle:
            raise RuntimeError("native tokenizer failed to parse container")

    def merge(self, tokens: List[int]) -> List[int]:
        n = len(tokens)
        arr = (ctypes.c_uint32 * n)(*tokens)
        new_n = self._lib.lmrs_tok_merge(self._handle, arr, n)
        return list(arr[:new_n])

    def lookup(self, text: str) -> Optional[int]:
        b = text.encode("utf-8")
        r = self._lib.lmrs_tok_lookup(self._handle, b, len(b))
        return None if r < 0 else int(r)

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.lmrs_tok_free(handle)
            self._handle = None


def available() -> bool:
    return _load() is not None
