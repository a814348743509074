"""Error recovery, circuit breaker, degradation ladder, resilient wrapper.

Port of the reference's resilience test strategy (reference
tests/test_error_recovery.py:86-470): breaker state machine incl.
half-open recovery, retry backoff, degradation levels, decorators, and
thread-safety under concurrent error handling.
"""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from photonic_flash_attention_tpu.config import get_config
from photonic_flash_attention_tpu.core.error_recovery import (
    CircuitBreaker,
    CircuitState,
    ErrorRecoveryManager,
    RecoveryPolicy,
    RecoveryStrategy,
    get_recovery_manager,
    reset_recovery_manager,
    with_circuit_breaker,
    with_error_recovery,
)
from photonic_flash_attention_tpu.resilience.fault_tolerance import (
    DegradationLevel,
    DegradationTrigger,
    GracefulDegradationManager,
    ResilientAttentionWrapper,
)
from photonic_flash_attention_tpu.utils.exceptions import (
    ComputationError,
    PhotonicFlashAttentionError,
    ValidationError,
)


@pytest.fixture(autouse=True)
def _fresh():
    reset_recovery_manager()
    yield
    reset_recovery_manager()


class TestCircuitBreaker:
    def test_opens_after_threshold(self):
        cb = CircuitBreaker("t", failure_threshold=3, recovery_timeout_s=60)
        for _ in range(3):
            with pytest.raises(RuntimeError):
                with cb:
                    raise RuntimeError("boom")
        assert cb.state == CircuitState.OPEN
        with pytest.raises(PhotonicFlashAttentionError):
            with cb:
                pass

    def test_half_open_recovery(self):
        cb = CircuitBreaker("t", failure_threshold=1, recovery_timeout_s=0.05)
        with pytest.raises(RuntimeError):
            with cb:
                raise RuntimeError("boom")
        assert cb.state == CircuitState.OPEN
        time.sleep(0.06)
        assert cb.state == CircuitState.HALF_OPEN
        with cb:
            pass  # success closes
        assert cb.state == CircuitState.CLOSED

    def test_half_open_failure_reopens(self):
        cb = CircuitBreaker("t", failure_threshold=1, recovery_timeout_s=0.05)
        with pytest.raises(RuntimeError):
            with cb:
                raise RuntimeError("boom")
        time.sleep(0.06)
        with pytest.raises(RuntimeError):
            with cb:
                raise RuntimeError("again")
        assert cb.state == CircuitState.OPEN

    def test_thread_safety(self):
        cb = CircuitBreaker("t", failure_threshold=50)
        errors = []

        def worker():
            for _ in range(20):
                try:
                    with cb:
                        pass
                except Exception as e:  # noqa: BLE001
                    errors.append(e)

        threads = [threading.Thread(target=worker) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert cb.state == CircuitState.CLOSED


class TestRecoveryManager:
    def test_abort_on_validation_error(self):
        mgr = ErrorRecoveryManager()
        with pytest.raises(ValidationError):
            mgr.handle_error(
                ValidationError("bad shape"), operation=lambda: 1, fallback=lambda: 2
            )

    def test_retry_transient(self):
        mgr = ErrorRecoveryManager()
        calls = {"n": 0}

        def op():
            calls["n"] += 1
            if calls["n"] < 2:
                raise TimeoutError("timeout")
            return "ok"

        assert mgr.handle_error(TimeoutError("timeout"), operation=op) == "ok"

    def test_fallback_on_computation_error(self):
        mgr = ErrorRecoveryManager()
        out = mgr.handle_error(
            ComputationError("kernel NaN"),
            operation=lambda: 1 / 0,
            fallback=lambda: "fallback",
        )
        assert out == "fallback"

    def test_custom_policy_precedence(self):
        mgr = ErrorRecoveryManager()
        mgr.add_policy(
            RecoveryPolicy(
                "custom", RecoveryStrategy.FALLBACK, message_substrings=("weird",)
            )
        )
        out = mgr.handle_error(
            RuntimeError("weird failure"), operation=lambda: 1, fallback=lambda: "fb"
        )
        assert out == "fb"

    def test_stats(self):
        mgr = ErrorRecoveryManager()
        try:
            mgr.handle_error(ValidationError("x"), operation=lambda: 1)
        except ValidationError:
            pass
        s = mgr.get_stats()
        assert s["total_errors"] == 1
        assert s["by_strategy"].get("abort") == 1

    def test_decorators(self):
        calls = {"n": 0}

        @with_error_recovery(fallback=lambda: "fb")
        def flaky():
            calls["n"] += 1
            raise ComputationError("kernel exploded")

        assert flaky() == "fb"

        @with_circuit_breaker("deco_test", failure_threshold=1)
        def bad():
            raise RuntimeError("x")

        with pytest.raises(RuntimeError):
            bad()
        with pytest.raises(PhotonicFlashAttentionError):
            bad()  # now open

    def test_concurrent_error_handling(self):
        mgr = ErrorRecoveryManager()
        results = []

        def worker():
            out = mgr.handle_error(
                ComputationError("kernel nan"),
                operation=lambda: 1,
                fallback=lambda: "fb",
            )
            results.append(out)

        threads = [threading.Thread(target=worker) for _ in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == ["fb"] * 16


class TestDegradation:
    def test_quant_accuracy_raises_precision(self):
        from photonic_flash_attention_tpu.config import set_global_config

        set_global_config(quant_mode="int8", kv_cache_dtype="int8")
        mgr = GracefulDegradationManager()
        mgr.degrade(DegradationTrigger.QUANT_ACCURACY)
        assert get_config().quant_mode == "bf16"
        assert mgr.level == DegradationLevel.REDUCED
        mgr.recover(DegradationTrigger.QUANT_ACCURACY)
        assert get_config().quant_mode == "int8"
        assert mgr.level == DegradationLevel.NORMAL

    def test_kernel_failure_pins_fused(self):
        mgr = GracefulDegradationManager()
        mgr.degrade(DegradationTrigger.KERNEL_FAILURE)
        assert get_config().flash_threshold == 1 << 30
        assert mgr.level == DegradationLevel.MINIMAL
        mgr.recover_all()
        assert get_config().flash_threshold == 512

    def test_idempotent_degrade(self):
        mgr = GracefulDegradationManager()
        a1 = mgr.degrade(DegradationTrigger.MEMORY_PRESSURE)
        a2 = mgr.degrade(DegradationTrigger.MEMORY_PRESSURE)
        assert a1 is a2
        mgr.recover_all()


class TestResilientWrapper:
    def _qkv(self, rng):
        q = jnp.asarray(rng.standard_normal((1, 32, 2, 16)), jnp.float32)
        return q, q, q

    def test_passthrough_on_success(self, rng):
        q, k, v = self._qkv(rng)
        calls = {"n": 0}

        def attn(q, k, v, mask=None):
            calls["n"] += 1
            return q * 2, None

        w = ResilientAttentionWrapper(attn)
        out, _ = w(q, k, v)
        assert calls["n"] == 1
        np.testing.assert_allclose(np.asarray(out), np.asarray(q) * 2)

    def test_fallback_path(self, rng):
        q, k, v = self._qkv(rng)

        def attn(q, k, v, mask=None):
            raise ComputationError("kernel nan")

        def fb(q, k, v, mask=None):
            return q + 1, None

        w = ResilientAttentionWrapper(attn, fallback_fn=fb)
        out, _ = w(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(q) + 1)

    def test_last_resort_is_finite_and_shaped(self, rng):
        q, k, v = self._qkv(rng)

        def attn(q, k, v, mask=None):
            raise ValidationError("unrecoverable")  # ABORT policy

        w = ResilientAttentionWrapper(attn)
        out, weights = w(q, k, v)
        assert out.shape == q.shape
        assert bool(jnp.all(jnp.isfinite(out)))
        assert weights is None
        assert w.get_status()["last_resort_uses"] == 1

    def test_repeated_failures_degrade(self, rng):
        q, k, v = self._qkv(rng)

        def attn(q, k, v, mask=None):
            raise ValidationError("boom")

        w = ResilientAttentionWrapper(attn, max_failures_before_degrade=2)
        w(q, k, v)
        w(q, k, v)
        assert w.degradation.level == DegradationLevel.MINIMAL
        w.degradation.recover_all()
