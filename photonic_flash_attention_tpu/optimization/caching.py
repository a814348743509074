"""Caching: result cache + persistent compile cache.

The rebirth of the reference's two cache stacks:

* ``ResultCache`` + ``cached_computation`` — reference
  scaling/cache_manager.py:32-631 (LRU/LFU/TTL eviction, computation
  results keyed on tensor shapes/dtypes + scalar args, hit/miss stats).
  On TPU the *useful* result cache is host-side memoization of pure
  computations on identical inputs (calibration sweeps, routing probes),
  not activation caching — kept deliberately small and explicit.
* ``CompileCacheManager`` — the reference's multi-level tensor cache
  (optimization/advanced_caching.py:27-879) has no TPU analogue worth
  faking, but its *purpose* (avoid recomputing expensive artifacts) maps
  exactly to XLA's persistent compilation cache: enabling it makes every
  kernel/model compile a disk artifact reusable across processes — the
  single highest-value cache on TPU.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
import os
import threading
import time
from collections import OrderedDict
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np

from ..utils.logging import get_logger

logger = get_logger("caching")


@dataclasses.dataclass
class CacheStats:
    hits: int = 0
    misses: int = 0
    evictions: int = 0
    expirations: int = 0

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0

    def as_dict(self) -> Dict:
        return {**dataclasses.asdict(self), "hit_rate": self.hit_rate}


class ResultCache:
    """LRU/LFU/TTL result cache (reference cache_manager.py:177-262)."""

    def __init__(
        self,
        capacity: int = 256,
        policy: str = "lru",  # lru | lfu | fifo
        ttl_s: Optional[float] = None,
    ) -> None:
        if policy not in ("lru", "lfu", "fifo"):
            raise ValueError(f"unknown eviction policy {policy!r}")
        self.capacity = capacity
        self.policy = policy
        self.ttl_s = ttl_s
        self._data: "OrderedDict[Any, Tuple[Any, float]]" = OrderedDict()
        self._freq: Dict[Any, int] = {}
        self._lock = threading.RLock()
        self.stats = CacheStats()

    def get(self, key: Any, default: Any = None) -> Any:
        with self._lock:
            entry = self._data.get(key)
            if entry is None:
                self.stats.misses += 1
                return default
            value, ts = entry
            if self.ttl_s is not None and time.time() - ts > self.ttl_s:
                del self._data[key]
                self._freq.pop(key, None)
                self.stats.expirations += 1
                self.stats.misses += 1
                return default
            self.stats.hits += 1
            self._freq[key] = self._freq.get(key, 0) + 1
            if self.policy == "lru":
                self._data.move_to_end(key)
            return value

    def put(self, key: Any, value: Any) -> None:
        with self._lock:
            if key in self._data:
                self._data[key] = (value, time.time())
                if self.policy == "lru":
                    self._data.move_to_end(key)
                return
            while len(self._data) >= self.capacity:
                self._evict_one()
            self._data[key] = (value, time.time())
            self._freq[key] = 0

    def _evict_one(self) -> None:
        if not self._data:
            return
        if self.policy == "lfu":
            victim = min(self._data, key=lambda k: self._freq.get(k, 0))
        else:  # lru and fifo both evict the head (lru moves-to-end on hit)
            victim = next(iter(self._data))
        del self._data[victim]
        self._freq.pop(victim, None)
        self.stats.evictions += 1

    def clear(self) -> None:
        with self._lock:
            self._data.clear()
            self._freq.clear()

    def __len__(self) -> int:
        return len(self._data)


def _array_fingerprint(x: Any) -> Tuple:
    """Cheap content-aware key: shape + dtype + a sampled hash.

    The reference keys on shapes only (cache_manager.py:447-517), which
    silently aliases different data; sampling 1 KB of bytes keeps keys
    cheap while making collisions across different inputs unlikely.
    """
    arr = np.asarray(x)
    sample = arr.reshape(-1)[:: max(1, arr.size // 256)].tobytes()
    digest = hashlib.blake2b(sample, digest_size=8).hexdigest()
    return ("arr", arr.shape, str(arr.dtype), digest)


def cache_key(*args: Any, **kwargs: Any) -> Tuple:
    parts = []
    for a in list(args) + sorted(kwargs.items()):
        if isinstance(a, tuple) and len(a) == 2 and isinstance(a[0], str):
            name, val = a
            parts.append((name,) + cache_key(val))
        elif hasattr(a, "shape") and hasattr(a, "dtype"):
            parts.append(_array_fingerprint(a))
        elif isinstance(a, (int, float, str, bool, type(None))):
            parts.append(a)
        else:
            parts.append(repr(a)[:128])
    return tuple(parts)


def cached_computation(cache: Optional[ResultCache] = None):
    """Memoize a pure array computation (reference ``cached_computation``)."""
    local = cache or ResultCache(capacity=64)

    def deco(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            key = (fn.__qualname__,) + cache_key(*args, **kwargs)
            sentinel = object()
            hit = local.get(key, sentinel)
            if hit is not sentinel:
                return hit
            out = fn(*args, **kwargs)
            local.put(key, out)
            return out

        wrapper.cache = local  # type: ignore[attr-defined]
        return wrapper

    return deco


class CompileCacheManager:
    """Persistent XLA compilation cache (the real multi-level cache win)."""

    def __init__(self, cache_dir: Optional[str] = None) -> None:
        self.cache_dir = cache_dir or os.environ.get(
            "PFA_COMPILE_CACHE", os.path.expanduser("~/.cache/pfa_tpu/xla")
        )
        self.enabled = False

    def enable(self) -> None:
        os.makedirs(self.cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", self.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        self.enabled = True
        logger.info("persistent compile cache at %s", self.cache_dir)

    def stats(self) -> Dict:
        n, size = 0, 0
        if os.path.isdir(self.cache_dir):
            for root, _, files in os.walk(self.cache_dir):
                for f in files:
                    n += 1
                    try:
                        size += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
        return {
            "enabled": self.enabled,
            "dir": self.cache_dir,
            "entries": n,
            "bytes": size,
        }
