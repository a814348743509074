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


class TestPII:
    def test_scan_finds_categories(self):
        from photonic_flash_attention_tpu.utils.security import scan_pii

        text = "mail me at alice@example.com from 10.0.0.1, ssn 123-45-6789"
        found = scan_pii(text)
        assert "email" in found and "ip_address" in found and "ssn" in found

    def test_redact(self):
        from photonic_flash_attention_tpu.utils.security import redact_pii

        out = redact_pii("contact bob@corp.io now")
        assert "bob@corp.io" not in out
        assert "[REDACTED-EMAIL]" in out

    def test_clean_text_untouched(self):
        from photonic_flash_attention_tpu.utils.security import redact_pii, scan_pii

        text = "flash attention block sizes are tuned per chip"
        assert scan_pii(text) == {}
        assert redact_pii(text) == text


class TestStateDictSanitizer:
    def test_finite_tree_passes(self):
        import jax.numpy as jnp

        from photonic_flash_attention_tpu.utils.security import sanitize_state_dict

        tree = {"a": {"w": jnp.ones((2, 2))}, "b": jnp.zeros(3)}
        assert sanitize_state_dict(tree) is tree

    def test_nan_leaf_rejected(self):
        import jax.numpy as jnp
        import pytest

        from photonic_flash_attention_tpu.utils.exceptions import SecurityError
        from photonic_flash_attention_tpu.utils.security import sanitize_state_dict

        tree = {"w": jnp.asarray([1.0, float("nan")])}
        with pytest.raises(SecurityError):
            sanitize_state_dict(tree)


class TestConfigIntegrity:
    def test_seal_and_verify(self):
        from photonic_flash_attention_tpu.utils.security import ConfigIntegrity

        ci = ConfigIntegrity()
        cfg = {"flash_threshold": 512, "quant_mode": "fp8"}
        ci.seal("engine", cfg)
        assert ci.verify("engine", cfg)
        cfg["flash_threshold"] = 1
        assert not ci.verify("engine", cfg)

    def test_assert_unchanged_raises(self):
        import pytest

        from photonic_flash_attention_tpu.utils.exceptions import SecurityError
        from photonic_flash_attention_tpu.utils.security import ConfigIntegrity

        ci = ConfigIntegrity()
        ci.seal("x", {"a": 1})
        ci.assert_unchanged("x", {"a": 1})
        with pytest.raises(SecurityError):
            ci.assert_unchanged("x", {"a": 2})
        with pytest.raises(SecurityError):
            ci.assert_unchanged("unknown", {})
