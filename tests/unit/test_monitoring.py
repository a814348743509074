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


class TestPressureTrend:
    def test_rising_trend_predicts_time_to_limit(self):
        from photonic_flash_attention_tpu.monitoring.health import PressureTrend

        tr = PressureTrend()
        # pressure rising 0.01/s from 0.5
        for i in range(10):
            tr.record(0.5 + 0.01 * i, t=1000.0 + i)
        slope = tr.slope_per_s()
        assert abs(slope - 0.01) < 1e-6
        # 0.85 is 0.26 above the last sample (0.59): ~26 s away
        eta = tr.seconds_to(0.85)
        assert 25.0 < eta < 27.0

    def test_flat_trend_has_no_eta(self):
        from photonic_flash_attention_tpu.monitoring.health import PressureTrend

        tr = PressureTrend()
        for i in range(5):
            tr.record(0.5, t=1000.0 + i)
        assert tr.seconds_to(0.9) is None

    def test_already_over_threshold(self):
        from photonic_flash_attention_tpu.monitoring.health import PressureTrend

        tr = PressureTrend()
        for i in range(3):
            tr.record(0.9 + 0.01 * i, t=float(i))
        assert tr.seconds_to(0.85) == 0.0


class TestPressureController:
    def test_actions_fire_on_transition(self):
        from photonic_flash_attention_tpu.monitoring.health import (
            PressureController,
            PressureState,
        )

        pc = PressureController()
        fired = []
        pc.on_state(PressureState.THROTTLING, lambda s: fired.append(s))
        pc.update(0.5)
        assert fired == []
        pc.update(0.80)  # NORMAL -> THROTTLING (range [0.75, 0.85))
        assert fired == [PressureState.THROTTLING]
        pc.update(0.82)  # no transition, no re-fire
        assert len(fired) == 1

    def test_action_errors_do_not_break_updates(self):
        from photonic_flash_attention_tpu.monitoring.health import (
            PressureController,
            PressureState,
        )

        pc = PressureController()
        pc.on_state(PressureState.WARNING, lambda s: 1 / 0)
        state = pc.update(0.7)
        assert state == PressureState.WARNING

    def test_status_surface(self):
        from photonic_flash_attention_tpu.monitoring.health import PressureController

        pc = PressureController()
        pc.update(0.5)
        pc.update(0.7)
        s = pc.get_status()
        assert s["state"] == "WARNING"
        assert len(s["recent_transitions"]) == 1


class TestPressureProtected:
    def test_refuses_at_critical(self):
        import pytest

        from photonic_flash_attention_tpu.monitoring.health import (
            PressureMonitor,
            PressureState,
            pressure_protected,
        )
        from photonic_flash_attention_tpu.utils.exceptions import HardwareError

        mon = PressureMonitor()

        @pressure_protected(mon, max_state=PressureState.CRITICAL)
        def work(x):
            return x * 2

        assert work(21) == 42
        mon.update(0.96)  # -> EMERGENCY
        with pytest.raises(HardwareError):
            work(21)

    def test_fallback_path(self):
        from photonic_flash_attention_tpu.monitoring.health import (
            PressureMonitor,
            PressureState,
            pressure_protected,
        )

        mon = PressureMonitor()
        mon.update(0.96)

        @pressure_protected(
            mon, max_state=PressureState.CRITICAL, fallback=lambda x: -x
        )
        def work(x):
            return x * 2

        assert work(21) == -21
