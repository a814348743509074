"""Health monitor + pressure state machine (hysteresis ladder)."""

import jax.numpy as jnp
import pytest

from photonic_flash_attention_tpu.monitoring.health import (
    HealthCheck,
    HealthCheckResult,
    HealthMonitor,
    HealthStatus,
    PressureMonitor,
    PressureState,
)


class TestPressureLadder:
    def test_escalation(self):
        pm = PressureMonitor()
        assert pm.update(0.5) == PressureState.NORMAL
        assert pm.update(0.7) == PressureState.WARNING
        assert pm.update(0.8) == PressureState.THROTTLING
        assert pm.update(0.9) == PressureState.CRITICAL
        assert pm.update(0.99) == PressureState.EMERGENCY

    def test_hysteresis_blocks_flapping(self):
        pm = PressureMonitor()
        pm.update(0.8)  # THROTTLING (floor 0.75)
        # small dip below threshold but inside hysteresis: stays
        assert pm.update(0.72) == PressureState.THROTTLING
        # drop beyond hysteresis margin: releases
        assert pm.update(0.69) == PressureState.WARNING
        assert pm.update(0.3) == PressureState.NORMAL

    def test_jump_down_requires_margin(self):
        pm = PressureMonitor()
        pm.update(0.99)  # EMERGENCY (floor 0.95)
        assert pm.update(0.94) == PressureState.EMERGENCY  # within 0.05
        assert pm.update(0.89) == PressureState.CRITICAL


class TestHealthMonitor:
    def test_run_checks_and_overall(self):
        hm = HealthMonitor()
        results = hm.run_checks()
        assert "device_reachable" in results
        assert results["device_reachable"].status == HealthStatus.HEALTHY
        assert hm.overall_status() in (
            HealthStatus.HEALTHY,
            HealthStatus.DEGRADED,
            HealthStatus.UNKNOWN,
        )

    def test_alert_callback_fires(self):
        hm = HealthMonitor()
        fired = []
        hm.add_alert_callback(fired.append)
        hm.add_check(
            HealthCheck(
                "always_bad",
                lambda: HealthCheckResult("always_bad", HealthStatus.CRITICAL, "x"),
            )
        )
        hm.run_checks()
        assert any(r.name == "always_bad" for r in fired)
        assert hm.overall_status() == HealthStatus.CRITICAL

    def test_failing_check_is_captured_not_raised(self):
        hm = HealthMonitor()

        def boom():
            raise RuntimeError("sensor exploded")

        hm.add_check(HealthCheck("boom", boom))
        results = hm.run_checks()
        assert results["boom"].status == HealthStatus.CRITICAL
        assert "sensor exploded" in results["boom"].message

    def test_status_surface(self):
        hm = HealthMonitor()
        hm.record_latency_ms(5.0)
        hm.record_latency_ms(7.0)
        hm.run_checks()
        s = hm.get_status()
        assert s["latency_ms"]["count"] == 2
        assert "pressure_state" in s and "overall" in s

    def test_background_loop_start_stop(self):
        hm = HealthMonitor(interval_s=0.01)
        hm.start()
        import time

        time.sleep(0.1)
        hm.stop()
        assert hm.get_status()["overall"] != "unknown"
