"""Core runtime: engine, router, autotuner, KV cache."""

from .autotuner import Autotuner, TuneResult, candidate_blocks
from .engine import AttentionEngine, get_engine, reset_engine
from .kv_cache import PagedKVCache, get_kv_cache, reset_kv_cache
from .router import AdaptiveRouter, KernelKind, WorkloadCharacteristics

__all__ = [
    "AdaptiveRouter",
    "AttentionEngine",
    "Autotuner",
    "KernelKind",
    "PagedKVCache",
    "TuneResult",
    "WorkloadCharacteristics",
    "candidate_blocks",
    "get_engine",
    "get_kv_cache",
    "reset_engine",
    "reset_kv_cache",
]
