"""Monitoring: health checks, pressure state machine, metric rings."""

from .health import (
    HealthCheck,
    HealthCheckResult,
    HealthMonitor,
    HealthStatus,
    PressureMonitor,
    PressureState,
    get_health_monitor,
)

__all__ = [
    "HealthCheck",
    "HealthCheckResult",
    "HealthMonitor",
    "HealthStatus",
    "PressureMonitor",
    "PressureState",
    "get_health_monitor",
]
