"""ctypes binding for the native (C++) page allocator.

Builds ``native/page_allocator.cpp`` into a shared library on first use
(g++, cached next to the source) and exposes ``NativePageAllocator`` with
the same allocator contract as the pure-Python bookkeeping in
:mod:`.kv_cache` / :mod:`.serving`. Falls back gracefully: callers check
:func:`native_available` and keep the Python path when the toolchain or
binary is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional

from ..utils.exceptions import KVCacheError
from ..utils.logging import get_logger

logger = get_logger("native_alloc")

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "page_allocator.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "native", "libpfa_alloc.so")

_lib: Optional[ctypes.CDLL] = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> Optional[str]:
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB)
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", lib],
            check=True,
            capture_output=True,
            timeout=120,
        )
        logger.info("built native allocator at %s", lib)
        return lib
    except (subprocess.SubprocessError, OSError) as e:
        logger.warning("native allocator build failed: %s", e)
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.pfa_alloc_create.restype = ctypes.c_void_p
        lib.pfa_alloc_create.argtypes = [ctypes.c_int32] * 4
        lib.pfa_alloc_destroy.argtypes = [ctypes.c_void_p]
        lib.pfa_alloc_sequence.restype = ctypes.c_int64
        lib.pfa_alloc_sequence.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.pfa_extend.restype = ctypes.c_int32
        lib.pfa_extend.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
        lib.pfa_set_length.restype = ctypes.c_int32
        lib.pfa_set_length.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
        lib.pfa_free_sequence.restype = ctypes.c_int32
        lib.pfa_free_sequence.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.pfa_get_pages.restype = ctypes.c_int32
        lib.pfa_get_pages.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.pfa_length.restype = ctypes.c_int32
        lib.pfa_length.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.pfa_stats.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


class NativePageAllocator:
    """C++-backed page allocator (see native/page_allocator.cpp)."""

    def __init__(
        self,
        num_pages: int,
        page_size: int,
        max_pages_per_seq: int,
        reserve_trash_page: bool = True,
    ) -> None:
        lib = _load()
        if lib is None:
            raise KVCacheError("native allocator unavailable (build failed)")
        self._lib = lib
        self._handle = lib.pfa_alloc_create(
            num_pages, page_size, max_pages_per_seq, 1 if reserve_trash_page else 0
        )
        if not self._handle:
            raise KVCacheError("native allocator creation failed")
        self.num_pages = num_pages
        self.page_size = page_size
        self.max_pages_per_seq = max_pages_per_seq

    def __del__(self) -> None:
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.pfa_alloc_destroy(handle)
            self._handle = None

    def allocate_sequence(self, reserve_tokens: int = 0) -> int:
        sid = self._lib.pfa_alloc_sequence(self._handle, reserve_tokens)
        if sid == -1:
            raise KVCacheError("KV cache out of pages")
        if sid == -2:
            raise KVCacheError("request exceeds max_pages_per_seq")
        return int(sid)

    def extend(self, seq_id: int, new_total_tokens: int) -> None:
        rc = self._lib.pfa_extend(self._handle, seq_id, new_total_tokens)
        if rc == -1:
            raise KVCacheError("KV cache out of pages")
        if rc == -2:
            raise KVCacheError("request exceeds max_pages_per_seq")
        if rc == -3:
            raise KVCacheError(f"unknown sequence {seq_id}")

    def set_length(self, seq_id: int, tokens: int) -> None:
        if self._lib.pfa_set_length(self._handle, seq_id, tokens) != 0:
            raise KVCacheError(f"unknown sequence {seq_id}")

    def length(self, seq_id: int) -> int:
        n = self._lib.pfa_length(self._handle, seq_id)
        if n == -3:
            raise KVCacheError(f"unknown sequence {seq_id}")
        return int(n)

    def free_sequence(self, seq_id: int) -> None:
        if self._lib.pfa_free_sequence(self._handle, seq_id) != 0:
            raise KVCacheError(f"unknown sequence {seq_id}")

    def page_ids(self, seq_id: int) -> List[int]:
        buf = (ctypes.c_int32 * self.max_pages_per_seq)()
        n = self._lib.pfa_get_pages(
            self._handle, seq_id, buf, self.max_pages_per_seq
        )
        if n == -3:
            raise KVCacheError(f"unknown sequence {seq_id}")
        if n < 0:
            raise KVCacheError(f"page table read failed ({n})")
        return list(buf[:n])

    def stats(self) -> Dict[str, int]:
        out = (ctypes.c_int64 * 7)()
        self._lib.pfa_stats(self._handle, out)
        keys = (
            "pages_used",
            "pages_free",
            "alloc_count",
            "free_count",
            "oom_events",
            "peak_pages_used",
            "sequences",
        )
        return dict(zip(keys, [int(v) for v in out]))
