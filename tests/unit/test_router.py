"""Router behavior: heuristics, warmup, exploitation, persistence.

Mirrors the reference's router contract (reference core/hybrid_router.py):
heuristic fallback below sample threshold, measured-latency exploitation,
cache invalidation on new measurements, state save/load.
"""

import pytest

from photonic_flash_attention_tpu.config import get_config, set_global_config
from photonic_flash_attention_tpu.core.router import (
    AdaptiveRouter,
    KernelKind,
    WorkloadCharacteristics,
)


def wc(q_len=1024, kv_len=None, **kw):
    return WorkloadCharacteristics(
        batch_size=kw.pop("batch_size", 2),
        q_len=q_len,
        kv_len=kv_len or q_len,
        num_heads=kw.pop("num_heads", 8),
        head_dim=kw.pop("head_dim", 64),
        **kw,
    )


AVAIL = (KernelKind.FUSED, KernelKind.FLASH)


class TestHeuristics:
    def test_short_seq_uses_fused(self):
        r = AdaptiveRouter(exploration_rate=0.0, seed=0)
        k = r.heuristic_selection(wc(q_len=128), AVAIL)
        assert k == KernelKind.FUSED

    def test_long_seq_uses_flash(self):
        r = AdaptiveRouter(exploration_rate=0.0, seed=0)
        k = r.heuristic_selection(wc(q_len=2048), AVAIL)
        assert k == KernelKind.FLASH

    def test_threshold_respects_config(self):
        set_global_config(flash_threshold=4096)
        r = AdaptiveRouter(exploration_rate=0.0, seed=0)
        assert r.heuristic_selection(wc(q_len=2048), AVAIL) == KernelKind.FUSED

    def test_need_weights_forces_fused(self):
        r = AdaptiveRouter(exploration_rate=0.0, seed=0)
        elig = r.eligible_kernels(wc(q_len=2048, need_weights=True), AVAIL)
        assert elig == [KernelKind.FUSED]

    def test_decode_prefers_paged(self):
        r = AdaptiveRouter(exploration_rate=0.0, seed=0)
        avail = AVAIL + (KernelKind.PAGED_DECODE,)
        k = r.heuristic_selection(
            wc(q_len=1, kv_len=2048, is_decode=True),
            r.eligible_kernels(wc(q_len=1, kv_len=2048, is_decode=True), avail),
        )
        assert k == KernelKind.PAGED_DECODE


class TestAdaptiveSelection:
    def test_warmup_measures_all_kernels(self):
        """Unmeasured kernels are selected first (warmup-then-exploit)."""
        r = AdaptiveRouter(exploration_rate=0.0, seed=0)
        w = wc(q_len=1024)
        seen = set()
        for _ in range(8):
            k = r.select_kernel(w, AVAIL)
            seen.add(k)
            r.update_performance(k, w, 1.0)
        assert seen == set(AVAIL)

    def test_exploits_measured_fastest(self):
        r = AdaptiveRouter(exploration_rate=0.0, seed=0)
        w = wc(q_len=1024)
        for _ in range(3):
            r.update_performance(KernelKind.FUSED, w, 10.0)
            r.update_performance(KernelKind.FLASH, w, 2.0)
        for _ in range(5):
            assert r.select_kernel(w, AVAIL) == KernelKind.FLASH

    def test_new_measurement_can_flip_choice(self):
        r = AdaptiveRouter(exploration_rate=0.0, seed=0)
        w = wc(q_len=1024)
        for _ in range(3):
            r.update_performance(KernelKind.FUSED, w, 2.0)
            r.update_performance(KernelKind.FLASH, w, 10.0)
        assert r.select_kernel(w, AVAIL) == KernelKind.FUSED
        # FLASH gets dramatically faster; EMA converges, cache invalidated.
        for _ in range(30):
            r.update_performance(KernelKind.FLASH, w, 0.1)
        assert r.select_kernel(w, AVAIL) == KernelKind.FLASH

    def test_bucketing_pow2(self):
        assert wc(q_len=1000).bucket() == wc(q_len=1024).bucket()
        assert wc(q_len=1025).bucket() != wc(q_len=1024).bucket()


class TestPersistence:
    def test_save_load_round_trip(self, tmp_path):
        path = str(tmp_path / "router.json")
        r = AdaptiveRouter(exploration_rate=0.0, seed=0, state_path=path)
        w = wc(q_len=512)
        for _ in range(3):
            r.update_performance(KernelKind.FLASH, w, 3.0)
        r.save_state()

        r2 = AdaptiveRouter(exploration_rate=0.0, seed=0, state_path=path)
        assert r2.predicted_latency(KernelKind.FLASH, w) == pytest.approx(3.0)

    def test_stats_shape(self):
        r = AdaptiveRouter(seed=0)
        w = wc()
        r.select_kernel(w, AVAIL)
        r.update_performance(KernelKind.FLASH, w, 1.0)
        s = r.get_stats()
        assert s["total_requests"] == 1
        assert "flash" in s["kernels"]


def test_save_load_roundtrips_measurement_freshness(tmp_path):
    """updated_at survives persistence: fresh measurements stay fresh,
    absent timestamps load as stale (re-measured on first selection)."""
    from photonic_flash_attention_tpu.core.router import (
        AdaptiveRouter,
        KernelKind,
        WorkloadCharacteristics,
    )

    w = WorkloadCharacteristics(
        batch_size=1, q_len=256, kv_len=256, num_heads=4, head_dim=64
    )
    r = AdaptiveRouter(seed=0)
    r.record_measurement(KernelKind.FLASH, w, 0.7)
    path = str(tmp_path / "router.json")
    r.save_state(path)

    r2 = AdaptiveRouter(seed=0, state_path=path)
    assert r2.predicted_latency(KernelKind.FLASH, w) == 0.7
    assert not r2.needs_measurement(KernelKind.FLASH, w)

    # Strip the timestamp (old-format state) -> stale on load.
    import json

    payload = json.load(open(path))
    for entries in payload["latency"].values():
        for e in entries:
            e.pop("updated_at", None)
    json.dump(payload, open(path, "w"))
    r3 = AdaptiveRouter(seed=0, state_path=path)
    assert r3.predicted_latency(KernelKind.FLASH, w) == 0.7
    assert r3.needs_measurement(KernelKind.FLASH, w)
