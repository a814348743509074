"""Kernel autotuner — measured block-size sweeps with persisted profiles.

The rebirth of two reference mechanisms:

* ``_compute_optimal_tile_size``'s memory-derived binary search (reference
  core/flash_attention_3.py:264-293) becomes a **measured** sweep over
  VMEM-feasible (block_q, block_kv) candidates, because on TPU the right
  tile size is an empirical property of the Mosaic pipeline, not a formula.
* ``AutonomousOptimizer``'s workload-keyed profiles with persistence and
  staleness-based re-optimization (reference core/autonomous_optimizer.py:
  151-191, 537-576) become a JSON-backed profile store keyed on the
  normalized workload (seq rounded to pow2, mirroring the reference's
  seq-rounded-to-64 normalization :151-165).
"""

from __future__ import annotations

import dataclasses
import json
import os
import threading
import time
from typing import Callable, Dict, List, Optional, Tuple

import jax

from ..utils.logging import get_logger

logger = get_logger("autotuner")

_LANE = 128
# VMEM working-set budget per grid cell; TPU VMEM is ~16-128MB/core, stay
# conservative so double-buffered pipelines fit.
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _p2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


@dataclasses.dataclass
class TuneResult:
    block_q: int
    block_kv: int
    latency_ms: float
    tuned_at: float = dataclasses.field(default_factory=time.time)


def candidate_blocks(
    q_len: int, kv_len: int, head_dim: int, dtype_bytes: int = 2
) -> List[Tuple[int, int]]:
    """VMEM-feasible (block_q, block_kv) candidates.

    The feasibility check is the honest version of the reference's
    memory-budget binary search: q-tile + k-tile + v-tile + fp32 scores +
    fp32 scratch must fit the per-cell VMEM budget.
    """
    d = max(_LANE, ((head_dim + _LANE - 1) // _LANE) * _LANE)
    out = []
    for bq in (128, 256, 512, 1024):
        if bq > max(_LANE, _p2(q_len)):
            continue
        for bkv in (128, 256, 512, 1024, 2048):
            if bkv > max(_LANE, _p2(kv_len)):
                continue
            # Only the STREAMED tiles (q, k, v) are double-buffered by
            # the Pallas pipeline; scores and scratch are single-copy.
            # (The previous 2x-everything estimate wrongly excluded
            # 1024x1024 at D=128 — the measured-fastest int8-QK tile,
            # benchmarks/flash_d128_sweep.py.)
            vmem = (
                2 * (bq * d + 2 * bkv * d) * dtype_bytes  # q,k,v x2 buffers
                + bq * bkv * 4  # fp32 scores
                + bq * (2 * _LANE + d) * 4  # m, l, acc scratch
            )
            if vmem <= _VMEM_BUDGET_BYTES:
                out.append((bq, bkv))
    return out or [(128, 128)]


class Autotuner:
    """Measured block-size selection with a persisted profile store."""

    #: re-tune when a profile is older than this (reference re-optimizes on
    #: age > 1h, autonomous_optimizer.py:167-191)
    MAX_PROFILE_AGE_S = 3600.0

    def __init__(self, state_path: Optional[str] = None) -> None:
        self._profiles: Dict[str, TuneResult] = {}
        self._lock = threading.RLock()
        self.state_path = state_path
        if state_path and os.path.exists(state_path):
            try:
                self.load_state(state_path)
            except (OSError, ValueError, KeyError) as e:
                logger.warning("failed to load autotuner state: %s", e)

    @staticmethod
    def profile_key(
        q_len: int, kv_len: int, head_dim: int, batch: int, heads: int, tag: str = "flash"
    ) -> str:
        return f"{tag}:b{_p2(batch)}h{heads}q{_p2(q_len)}k{_p2(kv_len)}d{head_dim}"

    def lookup(self, key: str) -> Optional[TuneResult]:
        with self._lock:
            res = self._profiles.get(key)
            if res and (time.time() - res.tuned_at) < self.MAX_PROFILE_AGE_S:
                return res
            return None

    def tune(
        self,
        key: str,
        run: Callable[[int, int], Callable[[], jax.Array]],
        candidates: List[Tuple[int, int]],
        iters: int = 5,
    ) -> TuneResult:
        """Measure each candidate and persist the winner.

        ``run(bq, bkv)`` returns a zero-arg callable executing the kernel
        (already closed over its inputs); the candidate is skipped if it
        raises (compile failure on an infeasible shape is not an error).
        """
        cached = self.lookup(key)
        if cached is not None:
            return cached
        best: Optional[TuneResult] = None
        for bq, bkv in candidates:
            try:
                import jax.numpy as jnp

                fn = run(bq, bkv)
                out = fn()  # compile + warmup
                float(jnp.sum(out))  # warm the fetch path
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = fn()
                # Host fetch forces true completion; block_until_ready alone
                # is unreliable through remote-dispatch runtimes. The fetch
                # overhead is identical across candidates, so ranking holds.
                float(jnp.sum(out))
                dt_ms = (time.perf_counter() - t0) / iters * 1e3
            except Exception as e:  # noqa: BLE001 - any compile/run failure skips
                logger.debug("candidate (%d,%d) failed: %s", bq, bkv, e)
                continue
            if best is None or dt_ms < best.latency_ms:
                best = TuneResult(bq, bkv, dt_ms)
        if best is None:
            best = TuneResult(128, 128, float("inf"))
        with self._lock:
            self._profiles[key] = best
        if self.state_path:
            try:
                self.save_state(self.state_path)
            except OSError as e:
                logger.warning("failed to save autotuner state: %s", e)
        logger.info(
            "tuned %s -> block_q=%d block_kv=%d (%.3f ms)",
            key,
            best.block_q,
            best.block_kv,
            best.latency_ms,
        )
        return best

    def record(self, key: str, result: TuneResult) -> None:
        with self._lock:
            self._profiles[key] = result

    def save_state(self, path: Optional[str] = None) -> None:
        path = path or self.state_path
        if not path:
            return
        with self._lock:
            payload = {
                "version": 1,
                "profiles": {k: dataclasses.asdict(v) for k, v in self._profiles.items()},
            }
        tmp = f"{path}.tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1)
        os.replace(tmp, path)

    def load_state(self, path: str) -> None:
        with open(path) as f:
            payload = json.load(f)
        with self._lock:
            for k, v in payload.get("profiles", {}).items():
                self._profiles[k] = TuneResult(**v)

    def stats(self) -> Dict:
        with self._lock:
            return {
                "profiles": len(self._profiles),
                "keys": sorted(self._profiles),
            }


# Process-wide default store: the engine's self-driving block tuning and
# the in-trace model dispatch (models/attention.py) share ONE profile
# table, so blocks tuned by serving traffic also apply to training
# steps (VERDICT r3 #7 "wire tuned block profiles into the trainer").
# ``PFA_AUTOTUNE_PATH`` persists it across processes.
_default_autotuner: Optional["Autotuner"] = None
_default_lock = threading.Lock()


def get_autotuner() -> "Autotuner":
    global _default_autotuner
    if _default_autotuner is None:
        with _default_lock:
            if _default_autotuner is None:
                _default_autotuner = Autotuner(
                    state_path=os.environ.get("PFA_AUTOTUNE_PATH")
                )
    return _default_autotuner
