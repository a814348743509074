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


class TestGQABuckets:
    def test_gqa_and_mha_get_distinct_buckets(self):
        """VERDICT r4 #8: num_kv_heads is part of the bucket key."""
        mha = wc(q_len=1024, num_heads=8)
        gqa = wc(q_len=1024, num_heads=8, num_kv_heads=2)
        assert mha.bucket() != gqa.bucket()
        # None == Hq: explicit MHA and default share a bucket.
        assert mha.bucket() == wc(q_len=1024, num_heads=8, num_kv_heads=8).bucket()

    def test_v1_profile_migrates_as_mha(self, tmp_path):
        """A v1 (10-element bucket) profile loads with Hkv assumed = Hq."""
        import json

        w = wc(q_len=512, num_heads=8)
        v2_bucket = list(w.bucket())
        v1_bucket = v2_bucket[:4] + v2_bucket[5:]  # drop the Hkv slot
        path = tmp_path / "router_v1.json"
        path.write_text(
            json.dumps(
                {
                    "version": 1,
                    "latency": {
                        "flash": [
                            {"bucket": v1_bucket, "value": 3.5, "count": 2}
                        ]
                    },
                }
            )
        )
        r = AdaptiveRouter(exploration_rate=0.0, seed=0, state_path=str(path))
        assert r.predicted_latency(KernelKind.FLASH, w) == pytest.approx(3.5)
        # Loaded-without-timestamp entries are stale -> re-measured.
        assert r.needs_measurement(KernelKind.FLASH, w)
        assert r.has_measurement(KernelKind.FLASH, w)


class TestDominancePruning:
    AVAIL3 = (KernelKind.FUSED, KernelKind.FLASH, KernelKind.FLASH_INT8QK)

    def _teach(self, r, loser, winner, n_buckets=3, margin=3.0):
        """Measure winner beating loser by `margin`x in n distinct buckets."""
        for i in range(n_buckets):
            w = wc(q_len=512 * (2 ** i))
            for _ in range(2):
                r.update_performance(loser, w, 10.0)
                r.update_performance(winner, w, 10.0 / margin)

    def test_dominated_kernel_not_measured_in_new_bucket(self):
        r = AdaptiveRouter(exploration_rate=0.0, seed=0)
        self._teach(r, KernelKind.FLASH_INT8QK, KernelKind.FLASH)
        # Fresh bucket: FUSED and FLASH are unmeasured there; INT8QK is
        # dominated by FLASH and must never be offered for measurement.
        w_new = wc(q_len=8192)
        chosen = set()
        for _ in range(12):
            k = r.select_kernel(w_new, self.AVAIL3)
            chosen.add(k)
            r.update_performance(k, w_new, 1.0)
        assert KernelKind.FLASH_INT8QK not in chosen
        assert r.get_stats()["measurements_pruned"].get("flash_int8qk", 0) > 0

    def test_close_races_are_not_pruned(self):
        """A <20% margin must NOT suppress measurement."""
        r = AdaptiveRouter(exploration_rate=0.0, seed=0)
        self._teach(r, KernelKind.FLASH_INT8QK, KernelKind.FLASH, margin=1.1)
        w_new = wc(q_len=8192)
        chosen = set()
        for _ in range(12):
            k = r.select_kernel(w_new, self.AVAIL3)
            chosen.add(k)
            r.update_performance(k, w_new, 1.0)
        assert KernelKind.FLASH_INT8QK in chosen

    def test_two_shared_buckets_insufficient(self):
        r = AdaptiveRouter(exploration_rate=0.0, seed=0)
        self._teach(r, KernelKind.FLASH_INT8QK, KernelKind.FLASH, n_buckets=2)
        w_new = wc(q_len=8192)
        chosen = set()
        for _ in range(12):
            k = r.select_kernel(w_new, self.AVAIL3)
            chosen.add(k)
            r.update_performance(k, w_new, 1.0)
        assert KernelKind.FLASH_INT8QK in chosen

    def test_fresh_bucket_single_warmup_choice_per_call(self):
        """Measurement budget (VERDICT r4 #7): each call to select_kernel
        nominates at most ONE kernel for measurement; a fresh bucket's
        first call never triggers more than one scan-fit."""
        r = AdaptiveRouter(exploration_rate=0.0, seed=0)
        w = wc(q_len=4096)
        k1 = r.select_kernel(w, self.AVAIL3)
        # Until that measurement is recorded, repeated calls nominate the
        # same single kernel (no multi-kernel warmup storm in one call).
        assert r.select_kernel(w, self.AVAIL3) == k1


class TestEnergyArbitration:
    """VERDICT r4 #10: config.energy_weight blends measured latency with
    the roofline-energy estimate so lower-HBM-traffic kernels win ties."""

    def _measured_router(self, energy):
        r = AdaptiveRouter(exploration_rate=0.0, seed=0)
        r.energy_model = energy
        w = wc(q_len=1024)
        for _ in range(3):
            # FLASH marginally faster; INT8QK much cheaper energetically.
            r.update_performance(KernelKind.FLASH, w, 1.00)
            r.update_performance(KernelKind.FLASH_INT8QK, w, 1.05)
        return r, w

    @staticmethod
    def _energy(kind, w, lat):
        return 30.0 if kind == KernelKind.FLASH_INT8QK else 300.0

    def test_default_ranks_by_latency(self):
        r, w = self._measured_router(self._energy)
        avail = (KernelKind.FLASH, KernelKind.FLASH_INT8QK)
        assert r.select_kernel(w, avail) == KernelKind.FLASH

    def test_energy_weight_flips_near_tie(self):
        set_global_config(energy_weight=0.5)
        r, w = self._measured_router(self._energy)
        avail = (KernelKind.FLASH, KernelKind.FLASH_INT8QK)
        # scores: flash 0.5*1.0 + 0.5*(300/170)=1.38; int8qk 0.5*1.05
        # + 0.5*(30/170)=0.61 -> int8qk wins.
        assert r.select_kernel(w, avail) == KernelKind.FLASH_INT8QK

    def test_energy_model_failure_falls_back_to_latency(self):
        set_global_config(energy_weight=0.5)

        def broken(kind, w, lat):
            raise RuntimeError("no device")

        r, w = self._measured_router(broken)
        avail = (KernelKind.FLASH, KernelKind.FLASH_INT8QK)
        assert r.select_kernel(w, avail) == KernelKind.FLASH
