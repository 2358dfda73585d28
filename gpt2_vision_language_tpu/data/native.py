"""ctypes bindings for the native C++ shard reader (csrc/shard_reader.cpp).

Build with `make -C csrc`; loaders fall back to numpy mmap when the shared
library is absent, so the native path is an optimization, never a
requirement.
"""

from __future__ import annotations

import ctypes
import functools
import os
from typing import Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "libshardreader.so"),
    "libshardreader.so",
]


@functools.lru_cache(maxsize=1)
def _load_lib():
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(os.path.abspath(p) if os.path.sep in p else p)
            break
        except OSError:
            continue
    else:
        return None
    lib.sr_open.restype = ctypes.c_void_p
    lib.sr_open.argtypes = [ctypes.c_char_p]
    lib.sr_len.restype = ctypes.c_longlong
    lib.sr_len.argtypes = [ctypes.c_void_p]
    lib.sr_elem_size.restype = ctypes.c_int
    lib.sr_elem_size.argtypes = [ctypes.c_void_p]
    lib.sr_read_i32.restype = ctypes.c_int
    lib.sr_read_i32.argtypes = [
        ctypes.c_void_p,
        ctypes.c_longlong,
        ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.sr_prefetch.restype = None
    lib.sr_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong]
    lib.sr_close.restype = None
    lib.sr_close.argtypes = [ctypes.c_void_p]
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class NativeShardReader:
    """One open .npy token shard backed by the C++ reader."""

    def __init__(self, path: str):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("libshardreader.so not built (make -C csrc)")
        self._lib = lib
        self._h = lib.sr_open(path.encode())
        if not self._h:
            raise IOError(f"sr_open failed for {path}")
        self._len = int(lib.sr_len(self._h))

    def __len__(self) -> int:
        return self._len

    def read(self, offset: int, count: int) -> np.ndarray:
        out = np.empty(count, np.int32)
        rc = self._lib.sr_read_i32(
            self._h,
            offset,
            count,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise IOError(f"sr_read_i32 rc={rc} (offset={offset}, count={count})")
        return out

    def prefetch(self, offset: int, count: int) -> None:
        self._lib.sr_prefetch(self._h, offset, count)

    def close(self) -> None:
        if self._h:
            self._lib.sr_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
