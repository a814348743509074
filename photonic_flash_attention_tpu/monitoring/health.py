"""Health + pressure monitoring mapped to real TPU signals.

The rebirth of the reference's monitors (reference
monitoring/health_monitor.py:20-606 pluggable checks + background loop +
alert callbacks; monitoring/thermal_monitor.py:17-785 5-state machine
with hysteresis). A TPU VM exposes no die temperature through JAX, so the
"thermal" state machine is re-grounded in the pressure signals that *do*
exist and matter for serving: HBM utilization, sustained kernel latency
inflation, and error rate. Same state ladder
(NORMAL/WARNING/THROTTLING/CRITICAL/EMERGENCY), same hysteresis
mechanics, honest inputs.
"""

from __future__ import annotations

import dataclasses
import enum
import threading
import time
from typing import Callable, Dict, List, Optional

import jax

from ..utils.logging import get_logger
from ..utils.monitoring import MetricRing, device_memory_stats

logger = get_logger("health")


class HealthStatus(str, enum.Enum):
    HEALTHY = "healthy"
    DEGRADED = "degraded"
    CRITICAL = "critical"
    UNKNOWN = "unknown"


class PressureState(int, enum.Enum):
    """The thermal ladder reborn (reference ThermalThresholds :26-67)."""

    NORMAL = 0
    WARNING = 1
    THROTTLING = 2
    CRITICAL = 3
    EMERGENCY = 4


@dataclasses.dataclass
class HealthCheckResult:
    name: str
    status: HealthStatus
    message: str = ""
    value: Optional[float] = None
    timestamp: float = dataclasses.field(default_factory=time.time)


class HealthCheck:
    """Pluggable check (reference health_monitor.py:98-341)."""

    def __init__(self, name: str, fn: Callable[[], HealthCheckResult]) -> None:
        self.name = name
        self.fn = fn

    def run(self) -> HealthCheckResult:
        try:
            return self.fn()
        except Exception as e:  # noqa: BLE001 - a failing check is a result
            return HealthCheckResult(self.name, HealthStatus.CRITICAL, str(e)[:200])


def device_reachable_check() -> HealthCheckResult:
    try:
        n = jax.device_count()
        return HealthCheckResult(
            "device_reachable", HealthStatus.HEALTHY, f"{n} device(s)", float(n)
        )
    except RuntimeError as e:
        return HealthCheckResult("device_reachable", HealthStatus.CRITICAL, str(e)[:200])


def hbm_utilization_check(warn: float = 0.85, crit: float = 0.95) -> HealthCheckResult:
    stats = device_memory_stats()
    util = stats.get("utilization")
    if util is None:
        return HealthCheckResult("hbm", HealthStatus.UNKNOWN, "no memory stats")
    status = (
        HealthStatus.CRITICAL
        if util >= crit
        else HealthStatus.DEGRADED if util >= warn else HealthStatus.HEALTHY
    )
    return HealthCheckResult("hbm", status, f"{util:.1%} in use", float(util))


class PressureMonitor:
    """Hysteresis state machine over a pressure metric in [0, 1].

    Thresholds mirror the reference's thermal ladder shape
    (65/75/85/95 -> here 0.65/0.75/0.85/0.95) with the same 5-unit
    (0.05) hysteresis on the way down (thermal_monitor.py:26-67).
    """

    THRESHOLDS = (0.65, 0.75, 0.85, 0.95)
    HYSTERESIS = 0.05

    def __init__(self) -> None:
        self.state = PressureState.NORMAL
        self._lock = threading.Lock()

    def update(self, pressure: float) -> PressureState:
        with self._lock:
            up = PressureState.NORMAL
            for i, th in enumerate(self.THRESHOLDS):
                if pressure >= th:
                    up = PressureState(i + 1)
            if up.value > self.state.value:
                self.state = up
            elif up.value < self.state.value:
                # require hysteresis margin below the current state's floor
                floor = self.THRESHOLDS[self.state.value - 1]
                if pressure < floor - self.HYSTERESIS:
                    self.state = up
            return self.state


class HealthMonitor:
    """Background health loop + alerts (reference health_monitor.py:343-608)."""

    def __init__(self, interval_s: float = 10.0) -> None:
        self.interval_s = interval_s
        self.checks: List[HealthCheck] = [
            HealthCheck("device_reachable", device_reachable_check),
            HealthCheck("hbm", hbm_utilization_check),
        ]
        self.pressure = PressureMonitor()
        self.latency_ring = MetricRing(256)
        self.error_ring = MetricRing(256)
        self._alert_callbacks: List[Callable[[HealthCheckResult], None]] = []
        self._results: Dict[str, HealthCheckResult] = {}
        self._lock = threading.RLock()
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    def add_check(self, check: HealthCheck) -> None:
        with self._lock:
            self.checks.append(check)

    def add_alert_callback(self, cb: Callable[[HealthCheckResult], None]) -> None:
        self._alert_callbacks.append(cb)

    def record_latency_ms(self, v: float) -> None:
        self.latency_ring.record(v)

    def record_error(self) -> None:
        self.error_ring.record(1.0)

    def run_checks(self) -> Dict[str, HealthCheckResult]:
        results = {}
        for check in list(self.checks):
            res = check.run()
            results[res.name] = res
            if res.status in (HealthStatus.DEGRADED, HealthStatus.CRITICAL):
                for cb in self._alert_callbacks:
                    try:
                        cb(res)
                    except Exception:  # noqa: BLE001 - alerts must not kill the loop
                        logger.exception("alert callback failed")
        hbm = results.get("hbm")
        if hbm is not None and hbm.value is not None:
            self.pressure.update(hbm.value)
        with self._lock:
            self._results = results
        return results

    def overall_status(self) -> HealthStatus:
        with self._lock:
            results = list(self._results.values())
        if not results:
            return HealthStatus.UNKNOWN
        if any(r.status == HealthStatus.CRITICAL for r in results):
            return HealthStatus.CRITICAL
        if any(r.status == HealthStatus.DEGRADED for r in results):
            return HealthStatus.DEGRADED
        return HealthStatus.HEALTHY

    def get_status(self) -> Dict:
        with self._lock:
            results = {
                k: {"status": r.status.value, "message": r.message, "value": r.value}
                for k, r in self._results.items()
            }
        return {
            "overall": self.overall_status().value,
            "pressure_state": self.pressure.state.name,
            "checks": results,
            "latency_ms": self.latency_ring.summary(),
            "errors": self.error_ring.summary(),
        }

    # -- background loop ----------------------------------------------------

    def start(self) -> None:
        if self._thread is not None:
            return
        self._stop.clear()

        def loop() -> None:
            while not self._stop.wait(self.interval_s):
                self.run_checks()

        self._thread = threading.Thread(target=loop, daemon=True, name="pfa-health")
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None


_monitor: Optional[HealthMonitor] = None
_monitor_lock = threading.Lock()


def get_health_monitor() -> HealthMonitor:
    global _monitor
    if _monitor is None:
        with _monitor_lock:
            if _monitor is None:
                _monitor = HealthMonitor()
    return _monitor
