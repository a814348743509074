"""i18n / compliance / regional deployment (reference globalization tests)."""

import time

import pytest

from photonic_flash_attention_tpu.globalization.compliance import (
    ComplianceManager,
    Regime,
)
from photonic_flash_attention_tpu.globalization.deployment import (
    RegionManager,
)
from photonic_flash_attention_tpu.globalization.i18n import I18n, translate


class TestI18n:
    def test_translate_all_locales(self):
        for lang in ("en", "es", "fr", "de", "ja", "zh"):
            i = I18n(lang)
            msg = i.t("engine.kernel_selected", kernel="flash")
            assert "flash" in msg

    def test_missing_key_falls_back(self):
        i = I18n("es")
        assert i.t("no.such.key") == "no.such.key"

    def test_bad_locale_rejected(self):
        i = I18n("en")
        with pytest.raises(ValueError):
            i.set_language("tlh")

    def test_number_formatting(self):
        assert I18n.format_number(1234.5, "en") == "1,234.50"
        assert I18n.format_number(1234.5, "de") == "1.234,50"

    def test_bytes_formatting(self):
        assert I18n.format_bytes(512) == "512 B"
        assert I18n.format_bytes(2 * 1024**3) == "2.0 GB"


class TestCompliance:
    def test_consent_gates_registration(self):
        m = ComplianceManager(Regime.GDPR)
        with pytest.raises(PermissionError):
            m.register("alice", "prompt", "hello")
        m.set_consent("alice", True)
        rid = m.register("alice", "prompt", "hello")
        assert rid in [r["record_id"] for r in m.export_user_data("alice")]

    def test_delete_user_data(self):
        m = ComplianceManager()
        m.set_consent("bob", True)
        m.register("bob", "prompt", "a")
        m.register("bob", "generation", "b")
        assert m.delete_user_data("bob") == 2
        assert m.export_user_data("bob") == []

    def test_anonymize(self):
        m = ComplianceManager()
        m.set_consent("carol", True)
        m.register("carol", "prompt", "x")
        assert m.anonymize_user("carol") == 1
        assert m.export_user_data("carol") == []  # linkage removed

    def test_retention_cleanup(self):
        m = ComplianceManager(Regime.GDPR)
        m.set_consent("dave", True)
        m.register("dave", "prompt", "x")
        future = time.time() + 31 * 86400
        assert m.retention_cleanup(now=future) == 1
        assert m.report()["records"] == 0


class TestRegions:
    def test_optimal_region_by_geo(self):
        rm = RegionManager()
        assert rm.optimal_region(user_geo="eu") == "europe-west4"
        assert rm.optimal_region(user_geo="apac") == "asia-northeast1"

    def test_regime_constraint(self):
        rm = RegionManager()
        r = rm.optimal_region(user_geo="us", required_regime=Regime.GDPR)
        assert r == "europe-west4"

    def test_failover(self):
        rm = RegionManager()
        rm.deploy("us-central1")
        alt = rm.mark_unhealthy("us-central1")
        assert alt is not None and alt != "us-central1"
        assert rm.status()["deployments"]["us-central1"]["healthy"] is False

    def test_unknown_region_rejected(self):
        with pytest.raises(ValueError):
            RegionManager().deploy("mars-north1")
