"""Security gates (reference tests/security/test_security_validation.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from photonic_flash_attention_tpu.utils.exceptions import SecurityError
from photonic_flash_attention_tpu.utils.security import (
    AuditLogger,
    InputSanitizer,
    RateLimiter,
    SecurityManager,
    SecurityPolicy,
)


class TestSanitizer:
    def test_valid_tensor_passes(self, rng):
        s = InputSanitizer()
        x = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)
        assert s.sanitize_tensor(x) is x

    def test_oversized_tensor_rejected(self):
        s = InputSanitizer(SecurityPolicy(max_tensor_bytes=64))
        with pytest.raises(SecurityError):
            s.sanitize_tensor(jnp.zeros((64, 64), jnp.float32))

    def test_nan_rejected(self):
        s = InputSanitizer()
        x = jnp.asarray([np.nan, 1.0], jnp.float32)
        with pytest.raises(SecurityError):
            s.sanitize_tensor(x)

    def test_non_array_rejected(self):
        with pytest.raises(SecurityError):
            InputSanitizer().sanitize_tensor("not a tensor")

    @pytest.mark.parametrize(
        "bad",
        ["<script>alert(1)</script>", "x; rm -rf /", "../../etc/passwd", "__import__"],
    )
    def test_suspicious_strings_rejected(self, bad):
        with pytest.raises(SecurityError):
            InputSanitizer().sanitize_string(bad)

    def test_clean_string_passes(self):
        assert InputSanitizer().sanitize_string("hello world-42") == "hello world-42"

    def test_deep_dict_rejected(self):
        d = {}
        cur = d
        for _ in range(12):
            cur["x"] = {}
            cur = cur["x"]
        with pytest.raises(SecurityError):
            InputSanitizer().sanitize_dict(d)


class TestRateLimiter:
    def test_blocks_after_budget(self):
        rl = RateLimiter(SecurityPolicy(max_requests_per_window=3, window_s=60))
        for _ in range(3):
            rl.check("c1")
        with pytest.raises(SecurityError):
            rl.check("c1")
        # now blocked, even a single call fails
        with pytest.raises(SecurityError):
            rl.check("c1")
        # other clients unaffected
        rl.check("c2")

    def test_window_slides(self):
        rl = RateLimiter(SecurityPolicy(max_requests_per_window=2, window_s=0.05))
        rl.check("c")
        rl.check("c")
        import time

        time.sleep(0.06)
        rl.check("c")  # window expired, allowed again


class TestManager:
    def test_validate_request_happy(self, rng):
        m = SecurityManager()
        x = jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)
        m.validate_request("client", tensors=(x,), payload={"model": "gpt2"})
        assert m.audit.recent(1)[0]["event"] == "ok"

    def test_rejects_and_audits(self):
        m = SecurityManager()
        with pytest.raises(SecurityError):
            m.validate_request("evil", payload={"cmd": "x; rm -rf /"})
        assert m.audit.risk_score("evil") >= 3

    def test_lockdown(self, rng):
        m = SecurityManager()
        m.emergency_lockdown()
        with pytest.raises(SecurityError):
            m.validate_request("anyone")
        m.emergency_lockdown(False)
        m.validate_request("anyone")
