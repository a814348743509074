"""ctypes binding for the native (C++) request scheduler.

Builds ``native/request_scheduler.cpp`` on first use (g++, cached next to
the source) — the priority admission queue of the serving engine, the
real version of the reference's priority task queue
(reference scaling/distributed_computing.py:252-379). Falls back to a
pure-Python scheduler with identical semantics when the toolchain is
missing; both sides keep FIFO-within-priority ordering and wait-time
percentile stats.
"""

from __future__ import annotations

import bisect
import ctypes
import os
import subprocess
import threading
import time
from typing import Dict, List, Optional

from ..utils.logging import get_logger

logger = get_logger("native_sched")

_SRC = os.path.join(
    os.path.dirname(__file__), "..", "native", "request_scheduler.cpp"
)
_LIB = os.path.join(os.path.dirname(__file__), "..", "native", "libpfa_sched.so")

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
        logger.info("built native scheduler at %s", lib)
        return lib
    except (subprocess.SubprocessError, OSError) as e:
        logger.warning("native scheduler build failed: %s", e)
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
        try:
            lib = ctypes.CDLL(path)
        except OSError as e:
            logger.warning("native scheduler load failed: %s", e)
            _build_failed = True
            return None
        lib.pfa_sched_create.restype = ctypes.c_void_p
        lib.pfa_sched_destroy.argtypes = [ctypes.c_void_p]
        lib.pfa_sched_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
        ]
        lib.pfa_sched_peek.argtypes = [ctypes.c_void_p]
        lib.pfa_sched_peek.restype = ctypes.c_int64
        lib.pfa_sched_pop.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.pfa_sched_pop.restype = ctypes.c_int32
        lib.pfa_sched_cancel.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.pfa_sched_cancel.restype = ctypes.c_int32
        lib.pfa_sched_count.argtypes = [ctypes.c_void_p]
        lib.pfa_sched_count.restype = ctypes.c_int64
        lib.pfa_sched_waiting.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.pfa_sched_waiting.restype = ctypes.c_int64
        lib.pfa_sched_stats.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _now_us() -> int:
    return int(time.monotonic() * 1e6)


class NativeRequestScheduler:
    """Priority admission queue backed by the C++ library."""

    def __init__(self) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError("native scheduler unavailable")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.pfa_sched_create())

    def __del__(self):  # pragma: no cover - finalizer
        try:
            if getattr(self, "_h", None):
                self._lib.pfa_sched_destroy(self._h)
                self._h = None
        except Exception:
            pass

    def submit(self, sid: int, priority: int = 0) -> None:
        self._lib.pfa_sched_submit(self._h, sid, priority, _now_us())

    def peek(self) -> Optional[int]:
        sid = self._lib.pfa_sched_peek(self._h)
        return None if sid < 0 else int(sid)

    def pop(self, sid: int) -> bool:
        return self._lib.pfa_sched_pop(self._h, sid, _now_us()) == 0

    def cancel(self, sid: int) -> bool:
        return self._lib.pfa_sched_cancel(self._h, sid) == 0

    def __len__(self) -> int:
        return int(self._lib.pfa_sched_count(self._h))

    def waiting_ids(self, cap: int = 65536) -> List[int]:
        buf = (ctypes.c_int64 * cap)()
        n = self._lib.pfa_sched_waiting(self._h, buf, cap)
        return [int(buf[i]) for i in range(n)]

    def stats(self) -> Dict[str, int]:
        out = (ctypes.c_int64 * 6)()
        self._lib.pfa_sched_stats(self._h, out)
        return {
            "waiting": int(out[0]),
            "admitted": int(out[1]),
            "cancelled": int(out[2]),
            "wait_p50_us": int(out[3]),
            "wait_p95_us": int(out[4]),
            "wait_max_us": int(out[5]),
        }


class PyRequestScheduler:
    """Pure-Python twin of the native scheduler (same contract)."""

    def __init__(self) -> None:
        self._entries: List = []  # sorted by (-priority, order)
        self._order = 0
        self._submit_us: Dict[int, int] = {}
        self._waits: List[int] = []
        self._admitted = 0
        self._cancelled = 0
        self._lock = threading.Lock()

    def submit(self, sid: int, priority: int = 0) -> None:
        with self._lock:
            bisect.insort(self._entries, (-priority, self._order, sid))
            self._order += 1
            self._submit_us[sid] = _now_us()

    def peek(self) -> Optional[int]:
        with self._lock:
            return self._entries[0][2] if self._entries else None

    def pop(self, sid: int) -> bool:
        with self._lock:
            if not self._entries or self._entries[0][2] != sid:
                return False
            self._entries.pop(0)
            t0 = self._submit_us.pop(sid, None)
            if t0 is not None:
                self._waits.append(_now_us() - t0)
                self._waits = self._waits[-512:]
            self._admitted += 1
            return True

    def cancel(self, sid: int) -> bool:
        with self._lock:
            for i, (_, _, s) in enumerate(self._entries):
                if s == sid:
                    self._entries.pop(i)
                    self._submit_us.pop(sid, None)
                    self._cancelled += 1
                    return True
            return False

    def __len__(self) -> int:
        return len(self._entries)

    def waiting_ids(self, cap: int = 65536) -> List[int]:
        with self._lock:
            return [sid for (_, _, sid) in self._entries[:cap]]

    def stats(self) -> Dict[str, int]:
        with self._lock:
            waits = sorted(self._waits)

            def pct(p):
                return waits[int(p * (len(waits) - 1))] if waits else 0

            return {
                "waiting": len(self._entries),
                "admitted": self._admitted,
                "cancelled": self._cancelled,
                "wait_p50_us": pct(0.5),
                "wait_p95_us": pct(0.95),
                "wait_max_us": waits[-1] if waits else 0,
            }


def make_scheduler():
    """Native scheduler when buildable, Python twin otherwise."""
    if native_available():
        try:
            return NativeRequestScheduler()
        except Exception as e:  # pragma: no cover - defensive
            logger.warning("falling back to Python scheduler: %s", e)
    return PyRequestScheduler()
