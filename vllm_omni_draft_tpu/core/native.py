"""ctypes bindings for the native host runtime (csrc/core_ext.cc).

Builds the shared library on first import (g++; ~1s, cached in
build/). Falls back cleanly to the pure-Python implementations when the
toolchain is unavailable — kv_cache.py dispatches on `AVAILABLE`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
_SRC = os.path.join(_REPO_ROOT, "csrc", "core_ext.cc")
_BUILD_DIR = os.path.join(_REPO_ROOT, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libvot_core.so")

_lib = None
_lock = threading.Lock()


def _build() -> str | None:
    if not os.path.exists(_SRC):
        return None
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(
        _SRC
    ):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC,
             "-o", _LIB_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH
    except Exception:
        return None


def get_lib():
    global _lib
    with _lock:
        if _lib is None:
            path = _build()
            if path is None:
                _lib = False
                return None
            lib = ctypes.CDLL(path)
            lib.vot_chain_hash.restype = ctypes.c_uint64
            lib.vot_chain_hash.argtypes = [
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.c_uint64,
            ]
            lib.vot_pool_new.restype = ctypes.c_void_p
            lib.vot_pool_new.argtypes = [ctypes.c_int32]
            lib.vot_pool_free.argtypes = [ctypes.c_void_p]
            lib.vot_pool_num_free.restype = ctypes.c_int64
            lib.vot_pool_num_free.argtypes = [ctypes.c_void_p]
            lib.vot_pool_alloc.restype = ctypes.c_int32
            lib.vot_pool_alloc.argtypes = [ctypes.c_void_p]
            lib.vot_pool_lookup_cached.restype = ctypes.c_int32
            lib.vot_pool_lookup_cached.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
            lib.vot_pool_commit_hash.argtypes = [
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_uint64,
            ]
            lib.vot_pool_release.argtypes = [ctypes.c_void_p, ctypes.c_int32]
            lib.vot_pool_clear_cache.argtypes = [ctypes.c_void_p]
            lib.vot_pool_refcount.restype = ctypes.c_int32
            lib.vot_pool_refcount.argtypes = [ctypes.c_void_p, ctypes.c_int32]
            _lib = lib
    return _lib if _lib is not False else None


def available() -> bool:
    return get_lib() is not None


class NativeBlockPool:
    """Drop-in behavioral equivalent of kv_cache.BlockPool backed by the
    C++ pool. Hashes are uint64 (vot_chain_hash), not Python hash()."""

    def __init__(self, num_blocks: int):
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native core_ext unavailable")
        self.num_blocks = num_blocks
        self._pool = self._lib.vot_pool_new(num_blocks)

    def __del__(self):
        if getattr(self, "_pool", None):
            self._lib.vot_pool_free(self._pool)
            self._pool = None

    @property
    def num_free(self) -> int:
        return self._lib.vot_pool_num_free(self._pool)

    def alloc(self) -> int:
        bid = self._lib.vot_pool_alloc(self._pool)
        if bid < 0:
            raise MemoryError("KV block pool exhausted")
        return bid

    def lookup_cached(self, h: int) -> int | None:
        bid = self._lib.vot_pool_lookup_cached(self._pool, h)
        return None if bid < 0 else bid

    def commit_hash(self, bid: int, h: int) -> None:
        self._lib.vot_pool_commit_hash(self._pool, bid, h)

    def release(self, bid: int) -> None:
        self._lib.vot_pool_release(self._pool, bid)

    def clear_cache(self) -> None:
        self._lib.vot_pool_clear_cache(self._pool)

    def refcount_of(self, bid: int) -> int:
        return self._lib.vot_pool_refcount(self._pool, bid)


def chain_hash(parent: int, token_ids, extra: int = 0) -> int:
    """Native 64-bit chain hash over one block of token ids."""
    lib = get_lib()
    import numpy as np

    arr = np.asarray(token_ids, dtype=np.int32)
    return lib.vot_chain_hash(
        ctypes.c_uint64(parent),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        arr.size,
        ctypes.c_uint64(extra & 0xFFFFFFFFFFFFFFFF),
    )
