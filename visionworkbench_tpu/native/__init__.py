"""ctypes bindings for the native C++ runtime (``native/vwtpu_runtime.cpp``):
GIL-free ordered tiled-TIFF writer and byte-LRU cache — the host-side
substrate the reference implements in C++ (``ThreadPool.h``,
``ImageIO.h:116-267``, ``Cache.h``).

The shared library is built on demand with g++ (no external deps); every
consumer falls back to the pure-Python path when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libvwtpu_runtime.so")
_SRC = os.path.normpath(os.path.join(_DIR, "..", "..", "native",
                                     "vwtpu_runtime.cpp"))
_lock = threading.Lock()
_lib = None
_tried = False

_DTYPE_CODES = {np.dtype(np.uint8): 0, np.dtype(np.uint16): 1,
                np.dtype(np.int16): 2, np.dtype(np.int32): 3,
                np.dtype(np.float32): 4, np.dtype(np.float64): 5}


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-pthread", "-o", _SO, _SRC], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native runtime; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.vwtpu_writer_create.restype = ctypes.c_void_p
        lib.vwtpu_writer_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.vwtpu_writer_submit.restype = ctypes.c_int
        lib.vwtpu_writer_submit.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                            ctypes.c_void_p]
        lib.vwtpu_writer_close.restype = ctypes.c_int
        lib.vwtpu_writer_close.argtypes = [ctypes.c_void_p]
        lib.vwtpu_cache_create.restype = ctypes.c_void_p
        lib.vwtpu_cache_create.argtypes = [ctypes.c_int64]
        lib.vwtpu_cache_put.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_void_p, ctypes.c_int64]
        lib.vwtpu_cache_get.restype = ctypes.c_int64
        lib.vwtpu_cache_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_void_p, ctypes.c_int64]
        lib.vwtpu_cache_stats.argtypes = [ctypes.c_void_p,
                                          ctypes.POINTER(ctypes.c_int64)]
        lib.vwtpu_cache_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


class NativeTileWriter:
    """Ordered async tiled-TIFF writer backed by the C++ runtime."""

    def __init__(self, path: str, height: int, width: int, bands: int, dtype,
                 tile_size: int = 256, window: int = 21):
        lib = load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        dt = np.dtype(dtype)
        if dt not in _DTYPE_CODES:
            raise ValueError(f"unsupported dtype {dt}")
        self._lib = lib
        self.dtype = dt
        self.tile = int(tile_size)
        self.bands = int(bands)
        self.h, self.w = int(height), int(width)
        self.ntx = -(-self.w // self.tile)
        self.nty = -(-self.h // self.tile)
        self._h = lib.vwtpu_writer_create(
            path.encode(), self.h, self.w, self.bands, _DTYPE_CODES[dt],
            self.tile, int(window))
        if not self._h:
            raise IOError(f"cannot open {path!r} for writing")

    def write_tile(self, tx: int, ty: int, tile: np.ndarray) -> None:
        full_shape = (self.tile, self.tile) + ((self.bands,)
                                               if self.bands > 1 else ())
        buf = np.zeros(full_shape, self.dtype)
        buf[:tile.shape[0], :tile.shape[1]] = tile
        buf = np.ascontiguousarray(buf)
        idx = ty * self.ntx + tx
        rc = self._lib.vwtpu_writer_submit(self._h, idx,
                                           buf.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise IOError("native tile writer failed")

    def close(self) -> None:
        if self._h:
            rc = self._lib.vwtpu_writer_close(self._h)
            self._h = None
            if rc != 0:
                raise IOError("native tile writer: incomplete or failed write")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class NativeLruCache:
    """Byte-LRU cache backed by the C++ runtime."""

    def __init__(self, budget_bytes: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.vwtpu_cache_create(int(budget_bytes))

    def put(self, key: str, data: bytes) -> None:
        self._lib.vwtpu_cache_put(self._h, key.encode(), data, len(data))

    def get(self, key: str) -> Optional[bytes]:
        n = self._lib.vwtpu_cache_get(self._h, key.encode(), None, 0)
        if n < 0:
            return None
        buf = ctypes.create_string_buffer(int(n))
        self._lib.vwtpu_cache_get(self._h, key.encode(), buf, n)
        return buf.raw

    def stats(self):
        out = (ctypes.c_int64 * 4)()
        self._lib.vwtpu_cache_stats(self._h, out)
        return {"used": out[0], "hits": out[1], "misses": out[2],
                "evictions": out[3]}

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.vwtpu_cache_destroy(self._h)
                self._h = None
        except Exception:
            pass
