"""Adaptive kernel router — learned per-call kernel selection.

The rebirth of the reference's ``AdaptiveRouter`` (reference
core/hybrid_router.py:20-259): where the reference picked GPU-vs-photonic
from a 7-dim feature vector with online linear latency models, this router
picks among *real TPU kernel variants* (fused short-seq / flash-tiled /
fp8-flash / paged-decode / ring) from **measured** per-bucket latencies —
the honest replacement for the reference's fake-learned cost model
(BASELINE.md hard part #4).

Kept from the reference, because they are good serving mechanics:
* workload bucketing with a bounded prediction cache (hybrid_router.py:106-135,
  seq quantized — here to powers of two — with FIFO cap 1000),
* heuristic fallback below a sample threshold (hybrid_router.py:160-173),
* epsilon-greedy exploration (hybrid_router.py:151-152),
* EMA performance updates fed back after every call (update_performance),
* JSON persistence of learned state (autonomous_optimizer.py:537-576's
  pickle, reborn as a portable JSON profile).
"""

from __future__ import annotations

import dataclasses
import enum
import json
import math
import os
import random
import threading
import time
from collections import OrderedDict, defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

from ..config import get_config
from ..utils.logging import get_logger

logger = get_logger("router")


class KernelKind(str, enum.Enum):
    """The kernel registry (SURVEY.md §7 phase 5)."""

    FUSED = "fused"  # XLA-fused O(S^2), short sequences
    FLASH = "flash"  # Pallas tiled online-softmax, bf16
    # Round-5 unrolled-KV kernels (ops/flash_unrolled.py): consecutive
    # kv tiles in one straight-line body so Mosaic overlaps the softmax
    # VPU stream with the next tile's matmuls; triangular static-extent
    # calls for causal. Mask-free non-decode workloads only, inside the
    # measured VMEM envelope (engine gates availability).
    FLASH_UNROLLED = "flash_unrolled"  # bf16 (1.3-1.5x the grid kernel)
    FLASH_UNROLLED_INT8QK = "flash_unrolled_int8qk"  # int8 score matmul
    FLASH_FP8 = "flash_fp8"  # fp8 with per-128-row-block scales (accurate)
    FLASH_FP8QK = "flash_fp8qk"  # fp8 QK, per-tensor scales, bf16 P.V
    FLASH_INT8QK = "flash_int8qk"  # int8 score matmul, bf16 P.V
    FLASH_INT8FULL = "flash_int8full"  # int8 QK + exp-folded int8 P.V
    PAGED_DECODE = "paged_decode"  # paged KV-cache decode kernel
    RING = "ring"  # sequence-parallel ring attention (KV rotation)
    ULYSSES = "ulysses"  # sequence-parallel all-to-all head re-shard


@dataclasses.dataclass(frozen=True)
class WorkloadCharacteristics:
    """Per-call workload features (reference hybrid_router.py:43-53)."""

    batch_size: int
    q_len: int
    kv_len: int
    num_heads: int
    head_dim: int
    causal: bool = False
    # "none" | "key" (per-key padding/bias — rides flash/paged/ring/
    # ulysses via kv_lens/k_bias) | "dense" (arbitrary (Sq, Skv)
    # structure — fused, or flash via the in-kernel 2-D bias tile
    # stream, ops/flash.py attn_bias)
    mask_kind: str = "none"
    need_weights: bool = False
    is_decode: bool = False
    dtype: str = "bfloat16"
    #: GQA KV head count; None = num_heads (MHA). Part of bucket() since
    #: round 5 (VERDICT r4 #8): a GQA and an MHA workload with equal Hq
    #: have different kernel rankings (int8qk GQA D=128 vs MHA D=64
    #: regimes differ ~2x) and different ulysses eligibility. Persisted
    #: v1 tables migrate by assuming MHA (load_state).
    num_kv_heads: Optional[int] = None

    @property
    def has_mask(self) -> bool:
        return self.mask_kind != "none"

    def bucket(self) -> Tuple:
        """Quantized cache key (reference rounds seq to 32; we use pow2)."""

        def p2(x: int) -> int:
            return 1 << max(0, (x - 1).bit_length())

        return (
            p2(self.batch_size),
            p2(self.q_len),
            p2(self.kv_len),
            self.num_heads,
            self.num_kv_heads or self.num_heads,
            self.head_dim,
            self.causal,
            self.mask_kind,
            self.need_weights,
            self.is_decode,
            self.dtype,
        )

    @property
    def total_flops(self) -> float:
        return 4.0 * self.batch_size * self.num_heads * self.q_len * self.kv_len * self.head_dim


@dataclasses.dataclass
class PerformanceMetrics:
    """What we record per call (reference hybrid_router.py PerformanceMetrics)."""

    latency_ms: float
    kernel: KernelKind
    timestamp: float = dataclasses.field(default_factory=time.time)


class _EMA:
    __slots__ = ("value", "count", "updated_at")

    def __init__(self) -> None:
        self.value: float = 0.0
        self.count: int = 0
        self.updated_at: float = 0.0

    def update(self, x: float, beta: float = 0.8) -> None:
        if self.count == 0:
            self.value = x
        else:
            self.value = beta * self.value + (1.0 - beta) * x
        self.count += 1
        self.updated_at = time.time()


class AdaptiveRouter:
    """Measured-latency kernel dispatch with exploration.

    Thread-safe (reference keeps an RLock on every shared structure,
    hybrid_router.py:87).
    """

    MIN_SAMPLES_PER_BUCKET = 2
    CACHE_CAP = 1000
    # Measurements older than this are re-taken on next selection (in-band
    # replacement for the reference's background re-optimizer).
    MEASUREMENT_MAX_AGE_S = 600.0

    def __init__(
        self,
        exploration_rate: float = 0.05,
        seed: Optional[int] = None,
        state_path: Optional[str] = None,
    ) -> None:
        self.exploration_rate = exploration_rate
        self._rng = random.Random(seed)
        self._lock = threading.RLock()
        # latency tables: {kernel: {bucket: EMA}}
        self._latency: Dict[KernelKind, Dict[Tuple, _EMA]] = defaultdict(dict)
        self._decision_cache: "OrderedDict[Tuple, KernelKind]" = OrderedDict()
        self._history: List[PerformanceMetrics] = []
        self._total_requests = 0
        # kernel.value -> how many times dominance pruning skipped its
        # measurement (observability for VERDICT r4 #7).
        self._pruned_counts: Dict[str, int] = {}
        #: optional energy estimator wired in by the engine
        #: (kind, workload, latency_ms) -> mJ; used only when
        #: config.energy_weight > 0 (VERDICT r4 #10).
        self.energy_model = None
        self.state_path = state_path
        if state_path and os.path.exists(state_path):
            try:
                self.load_state(state_path)
            except (OSError, ValueError, KeyError) as e:
                logger.warning("failed to load router state: %s", e)

    # -- eligibility ------------------------------------------------------

    def eligible_kernels(
        self, w: WorkloadCharacteristics, available: Sequence[KernelKind]
    ) -> List[KernelKind]:
        """Hard feasibility gates (not preferences)."""
        out = []
        for kind in available:
            if w.need_weights and kind != KernelKind.FUSED:
                continue  # only the fused path materializes weights
            if w.mask_kind == "dense" and kind not in (
                KernelKind.FUSED,
                KernelKind.FLASH,
            ):
                continue  # dense (Sq, Skv) masks: fused, or flash via the
                # in-kernel 2-D bias tile stream (ops/flash.py attn_bias)
            if w.mask_kind == "key" and kind not in (
                KernelKind.FUSED,
                KernelKind.FLASH,
                KernelKind.FLASH_UNROLLED,
                KernelKind.PAGED_DECODE,
                KernelKind.RING,
                KernelKind.ULYSSES,
            ):
                continue  # key-padding rides flash/unrolled/paged/ring/
                # ulysses via kv_lens (+k_bias): the ring clips lens per
                # shard, ulysses applies them post-all_to_all (VERDICT r3
                # weak #4); round 5: the unrolled kernel takes the bias
                # form in-kernel
            if kind == KernelKind.PAGED_DECODE and not w.is_decode:
                continue
            if kind == KernelKind.FLASH_UNROLLED and (
                w.is_decode
                or w.mask_kind not in ("none", "key")
                or w.q_len != w.kv_len
            ):
                continue  # square self-attention, plain or key-masked
                # (the engine additionally gates the VMEM envelope)
            if kind == KernelKind.FLASH_UNROLLED_INT8QK and (
                w.is_decode or w.mask_kind != "none" or w.q_len != w.kv_len
            ):
                continue  # int8 variant: mask-free only
            if kind in (KernelKind.RING, KernelKind.ULYSSES) and (
                w.is_decode or w.mask_kind not in ("none", "key")
            ):
                continue  # seq-parallel kernels: dense-mask plumbing absent
            out.append(kind)
        return out or [KernelKind.FUSED]

    # -- selection --------------------------------------------------------

    def heuristic_selection(
        self, w: WorkloadCharacteristics, eligible: Sequence[KernelKind]
    ) -> KernelKind:
        """Threshold dispatch (reference hybrid_router.py:160-173 reborn).

        The reference routed to photonic when seq >= photonic_threshold; we
        route to flash when seq >= flash_threshold, ring above ring_threshold.
        """
        cfg = get_config()
        if w.is_decode and KernelKind.PAGED_DECODE in eligible:
            return KernelKind.PAGED_DECODE
        if max(w.q_len, w.kv_len) >= cfg.ring_threshold:
            # Ring keeps the sequence sharded (memory-safe at any S);
            # Ulysses needs the full sequence per device but gets
            # full-locality flash — the measured tables arbitrate when
            # both are offered (SURVEY §2.5: "Ulysses when heads >=
            # chips"), the heuristic defaults to the memory-safe choice.
            if KernelKind.RING in eligible:
                return KernelKind.RING
            if KernelKind.ULYSSES in eligible:
                return KernelKind.ULYSSES
        if max(w.q_len, w.kv_len) >= cfg.flash_threshold:
            for kind in (
                KernelKind.FLASH_UNROLLED,  # round-5 measured fastest
                KernelKind.FLASH_UNROLLED_INT8QK,
                KernelKind.FLASH_INT8FULL,
                KernelKind.FLASH_INT8QK,
                KernelKind.FLASH_FP8QK,
                KernelKind.FLASH_FP8,
                KernelKind.FLASH,
            ):
                if kind in eligible:
                    return kind
        if KernelKind.FUSED in eligible:
            return KernelKind.FUSED
        return eligible[0]

    def select_kernel(
        self,
        w: WorkloadCharacteristics,
        available: Sequence[KernelKind],
    ) -> KernelKind:
        """Pick the kernel for this call (reference select_device :96-158)."""
        with self._lock:
            self._total_requests += 1
            eligible = self.eligible_kernels(w, available)
            if len(eligible) == 1:
                return eligible[0]
            bucket = w.bucket()
            cache_key = (bucket, tuple(eligible))

            explore = self._rng.random() < self.exploration_rate
            if not explore:
                cached = self._decision_cache.get(cache_key)
                if cached is not None and cached in eligible:
                    return cached

            measured = {
                k: self._latency[k][bucket]
                for k in eligible
                if bucket in self._latency[k]
                and self._latency[k][bucket].count >= self.MIN_SAMPLES_PER_BUCKET
            }
            unmeasured = [k for k in eligible if k not in measured]
            # Dominance pruning (VERDICT r4 #7): don't pay to measure a
            # kernel in a NEW bucket when a sibling already beats it by
            # >20% in >=3 other buckets with no counterexample
            # (flash_fp8/int8full lose to int8qk at every measured
            # geometry — re-learning that per bucket made warmup cost
            # O(#kernels) per bucket).
            if unmeasured:
                kept = [
                    k for k in unmeasured if not self._is_dominated(k, eligible)
                ]
                pruned = [k for k in unmeasured if k not in kept]
                if pruned:
                    for k in pruned:
                        self._pruned_counts[k.value] = (
                            self._pruned_counts.get(k.value, 0) + 1
                        )
                if kept or measured:
                    unmeasured = kept

            if explore and unmeasured:
                choice = self._rng.choice(unmeasured)
            elif unmeasured:
                # Warmup: measure every eligible kernel before exploiting
                # (reference _warmup_forward :543-597 runs both and keeps faster).
                choice = unmeasured[0]
            elif explore:
                choice = self._rng.choice(eligible)
            else:
                choice = min(measured, key=lambda k: self._score(k, w, measured))
                self._cache_decision(cache_key, choice)
            return choice

    #: board power used to express energy as time (mJ / W = ms) in the
    #: blended score; mirrors engine.CHIP_POWER_WATTS (importing it here
    #: would be circular).
    BOARD_POWER_W = 170.0

    def _score(self, kind: KernelKind, w, measured) -> float:
        """Arbitration score: measured latency, optionally blended with
        the roofline-energy estimate (config.energy_weight in [0, 1]) so
        a lower-HBM-traffic kernel can beat an equal-latency one —
        VERDICT r4 #10; the reference's latency-vs-energy framing
        (hybrid_router.py:599-611) with measured inputs."""
        lat = measured[kind].value
        wgt = get_config().energy_weight
        if wgt <= 0.0 or self.energy_model is None:
            return lat
        try:
            e_mj = self.energy_model(kind, w, lat)
        except Exception:  # noqa: BLE001 - scoring must never break dispatch
            return lat
        return (1.0 - wgt) * lat + wgt * (e_mj / self.BOARD_POWER_W)

    # Dominance pruning thresholds: ``other`` must beat ``kind`` by >20%
    # in every one of >=3 shared-measured buckets to suppress measuring
    # ``kind`` in new buckets.
    DOMINANCE_MARGIN = 0.8
    DOMINANCE_MIN_BUCKETS = 3

    def _is_dominated(
        self, kind: KernelKind, eligible: Sequence[KernelKind]
    ) -> bool:
        """True if some eligible sibling beats ``kind`` by more than the
        margin in every shared measured bucket (>= DOMINANCE_MIN_BUCKETS
        of them). Called under self._lock."""
        table_k = self._latency.get(kind)
        if not table_k:
            return False
        mine = {
            b: e.value
            for b, e in table_k.items()
            if e.count >= self.MIN_SAMPLES_PER_BUCKET
        }
        if len(mine) < self.DOMINANCE_MIN_BUCKETS:
            return False
        for other in eligible:
            if other is kind:
                continue
            table_o = self._latency.get(other)
            if not table_o:
                continue
            shared = [
                b
                for b, e in table_o.items()
                if b in mine and e.count >= self.MIN_SAMPLES_PER_BUCKET
            ]
            if len(shared) < self.DOMINANCE_MIN_BUCKETS:
                continue
            if all(
                table_o[b].value < self.DOMINANCE_MARGIN * mine[b]
                for b in shared
            ):
                return True
        return False

    def _cache_decision(self, key: Tuple, kernel: KernelKind) -> None:
        self._decision_cache[key] = kernel
        while len(self._decision_cache) > self.CACHE_CAP:
            self._decision_cache.popitem(last=False)

    # -- feedback ---------------------------------------------------------

    def update_performance(
        self, kernel: KernelKind, w: WorkloadCharacteristics, latency_ms: float
    ) -> None:
        """Record a measured latency (reference update_performance :181-242)."""
        with self._lock:
            bucket = w.bucket()
            ema = self._latency[kernel].setdefault(bucket, _EMA())
            ema.update(latency_ms)
            self._history.append(PerformanceMetrics(latency_ms, kernel))
            if len(self._history) > 10_000:
                del self._history[:5000]
            # New measurement may change the winner: drop cached decisions
            # for this bucket.
            stale = [k for k in self._decision_cache if k[0] == bucket]
            for k in stale:
                del self._decision_cache[k]

    def needs_measurement(
        self, kernel: KernelKind, w: WorkloadCharacteristics
    ) -> bool:
        """True if (kernel, bucket) lacks an honest measurement or it is stale.

        Staleness re-measurement replaces the reference's background
        re-optimization thread (autonomous_optimizer.py:167-191): tables
        refresh in-band when they age out instead of from a daemon.
        """
        with self._lock:
            ema = self._latency[kernel].get(w.bucket())
            if ema is None or ema.count < self.MIN_SAMPLES_PER_BUCKET:
                return True
            return (time.time() - ema.updated_at) > self.MEASUREMENT_MAX_AGE_S

    def has_measurement(
        self, kernel: KernelKind, w: WorkloadCharacteristics
    ) -> bool:
        """True if (kernel, bucket) has an honest measurement, fresh OR
        stale — a stale table is still servable while an off-thread
        refresh runs (see AttentionEngine._refresh_async)."""
        with self._lock:
            ema = self._latency[kernel].get(w.bucket())
            return ema is not None and ema.count >= self.MIN_SAMPLES_PER_BUCKET

    def record_measurement(
        self, kernel: KernelKind, w: WorkloadCharacteristics, latency_ms: float
    ) -> None:
        """Feed one *honest* kernel-time measurement (see core/timing.py).

        Unlike :meth:`update_performance` this marks the bucket as fully
        measured: warmup measurements are dispatch-overhead-free linear
        fits, so one of them carries more information than
        MIN_SAMPLES_PER_BUCKET noisy per-call samples.
        """
        self.update_performance(kernel, w, latency_ms)
        with self._lock:
            ema = self._latency[kernel][w.bucket()]
            ema.count = max(ema.count, self.MIN_SAMPLES_PER_BUCKET)

    def note_usage(self, kernel: KernelKind, latency_ms: float) -> None:
        """Record that a call used ``kernel`` (history/usage stats only).

        Per-call wall-clock through a tunneled runtime is dispatch noise
        (bench.py docstring); it feeds the observability surface but NOT
        the latency tables the router ranks kernels by.
        """
        with self._lock:
            self._history.append(PerformanceMetrics(latency_ms, kernel))
            if len(self._history) > 10_000:
                del self._history[:5000]

    def predicted_latency(
        self, kernel: KernelKind, w: WorkloadCharacteristics
    ) -> Optional[float]:
        with self._lock:
            ema = self._latency[kernel].get(w.bucket())
            return ema.value if ema and ema.count else None

    # -- stats / persistence ---------------------------------------------

    def get_stats(self) -> Dict:
        with self._lock:
            per_kernel: Dict[str, Dict] = {}
            for kernel, table in self._latency.items():
                lat = [e.value for e in table.values() if e.count]
                per_kernel[kernel.value] = {
                    "buckets_measured": len(table),
                    "mean_bucket_latency_ms": (sum(lat) / len(lat)) if lat else None,
                }
            recent = self._history[-100:]
            usage: Dict[str, int] = defaultdict(int)
            for m in recent:
                usage[m.kernel.value] += 1
            return {
                "total_requests": self._total_requests,
                "cache_entries": len(self._decision_cache),
                "kernels": per_kernel,
                "recent_usage": dict(usage),
                "measurements_pruned": dict(self._pruned_counts),
            }

    def save_state(self, path: Optional[str] = None) -> None:
        path = path or self.state_path
        if not path:
            return
        with self._lock:
            payload = {
                # v2 (round 5): bucket tuples carry num_kv_heads at
                # index 4. v1 profiles load by assuming MHA.
                "version": 2,
                "latency": {
                    kernel.value: [
                        {
                            "bucket": list(bucket),
                            "value": ema.value,
                            "count": ema.count,
                            "updated_at": ema.updated_at,
                        }
                        for bucket, ema in table.items()
                    ]
                    for kernel, table in self._latency.items()
                },
            }
        tmp = f"{path}.tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)

    def load_state(self, path: str) -> None:
        with open(path) as f:
            payload = json.load(f)
        version = int(payload.get("version", 1))
        with self._lock:
            for kernel_name, entries in payload.get("latency", {}).items():
                try:
                    kernel = KernelKind(kernel_name)
                except ValueError:
                    continue
                for e in entries:
                    ema = _EMA()
                    ema.value = float(e["value"])
                    ema.count = int(e["count"])
                    # Absent/zero timestamp => stale => re-measured on
                    # first selection after load.
                    ema.updated_at = float(e.get("updated_at", 0.0))
                    bucket = list(e["bucket"])
                    if version < 2 and len(bucket) == 10:
                        # v1 -> v2 migration: no num_kv_heads recorded;
                        # assume MHA (Hkv = Hq, bucket index 3).
                        bucket.insert(4, bucket[3])
                    self._latency[kernel][tuple(bucket)] = ema

    def reset(self) -> None:
        with self._lock:
            self._latency.clear()
            self._decision_cache.clear()
            self._history.clear()
            self._total_requests = 0
