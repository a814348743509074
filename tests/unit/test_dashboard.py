"""Metrics endpoint + dashboard (reference monitoring/dashboard.py +
prometheus.yml scrape surface, rebuilt working)."""

import json
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from photonic_flash_attention_tpu.monitoring.dashboard import (
    MetricsServer,
    collect_metrics,
    render_prometheus,
)


@pytest.fixture
def warm_engine(rng):
    from photonic_flash_attention_tpu.core.engine import get_engine, reset_engine

    reset_engine()
    q = jnp.asarray(rng.standard_normal((1, 128, 4, 64)), jnp.float32)
    get_engine()(q, q, q)
    yield
    reset_engine()


class TestPrometheusRendering:
    def test_flattens_nested_numbers(self):
        text = render_prometheus(
            {"engine": {"total_calls": 3, "router": {"hit_rate": 0.5}}}
        )
        assert "pfa_engine_total_calls 3.0" in text
        assert "pfa_engine_router_hit_rate 0.5" in text
        assert "# TYPE pfa_engine_total_calls gauge" in text

    def test_bools_become_01_and_strings_skipped(self):
        text = render_prometheus({"x": {"ok": True, "name": "flash"}})
        assert "pfa_x_ok 1.0" in text
        assert "flash" not in text

    def test_collects_live_engine(self, warm_engine):
        m = collect_metrics()
        assert "engine" in m
        assert m["engine"]["total_calls"] >= 1
        text = render_prometheus(m)
        assert "pfa_engine_total_calls" in text


class TestMetricsServer:
    def test_endpoints(self, warm_engine):
        srv = MetricsServer(port=0, host="127.0.0.1")
        port = srv.start()
        try:
            base = f"http://127.0.0.1:{port}"
            metrics = urllib.request.urlopen(f"{base}/metrics").read().decode()
            assert "pfa_engine_total_calls" in metrics

            health = json.loads(urllib.request.urlopen(f"{base}/health").read())
            assert health["overall"] in ("healthy", "degraded", "critical")

            html = urllib.request.urlopen(f"{base}/").read().decode()
            assert "photonic-flash-attention-tpu" in html

            with pytest.raises(urllib.error.HTTPError):
                urllib.request.urlopen(f"{base}/nope")
        finally:
            srv.stop()

    def test_start_stop_idempotent(self):
        srv = MetricsServer(port=0, host="127.0.0.1")
        p1 = srv.start()
        assert srv.start() == p1
        srv.stop()
        srv.stop()
