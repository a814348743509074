"""Monitoring: health checks, pressure state machine + controller, metric rings."""

from .health import (
    HealthCheck,
    HealthCheckResult,
    HealthMonitor,
    HealthStatus,
    PressureController,
    PressureMonitor,
    PressureState,
    PressureTrend,
    get_health_monitor,
    pressure_protected,
)

__all__ = [
    "HealthCheck",
    "HealthCheckResult",
    "HealthMonitor",
    "HealthStatus",
    "PressureController",
    "PressureMonitor",
    "PressureState",
    "PressureTrend",
    "get_health_monitor",
    "pressure_protected",
]
