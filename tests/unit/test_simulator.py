"""Design-space simulators: kernel pipeline + ICI topology.

The TPU analogue of the reference's circuit-simulator tests: sweep the
design space, check physical consistency (more work -> more time, fewer
bytes -> faster) rather than exact constants.
"""

import pytest

from photonic_flash_attention_tpu.hardware.detection import TPUCapabilities
from photonic_flash_attention_tpu.hardware.simulator import (
    KernelPipelineSimulator,
    TopologySimulator,
)

V5E = TPUCapabilities("v5e", 197.0, 394.0, 16.0, 819.0, 128.0, 200.0)


class TestKernelPipelineSimulator:
    def sim(self):
        return KernelPipelineSimulator(caps=V5E)

    def test_predict_basic(self):
        p = self.sim().predict(4, 2048, 2048, 12, 64, 512, 1024, causal=True)
        assert p.feasible
        assert p.t_total_us > 0
        assert p.bound in ("dma", "mxu", "vpu")

    def test_causal_halves_cells(self):
        s = self.sim()
        full = s.predict(1, 2048, 2048, 8, 64, 256, 256, causal=False)
        caus = s.predict(1, 2048, 2048, 8, 64, 256, 256, causal=True)
        assert caus.grid_cells == full.grid_cells // 2
        assert caus.t_total_us < full.t_total_us

    def test_vmem_infeasible_flagged(self):
        s = KernelPipelineSimulator(caps=V5E, vmem_budget_fraction=0.01)
        p = s.predict(1, 4096, 4096, 8, 128, 1024, 2048)
        assert not p.feasible

    def test_sweep_sorted_and_feasible(self):
        preds = self.sim().sweep(4, 2048, 2048, 12, 64, causal=True)
        assert preds
        times = [p.t_total_us for p in preds]
        assert times == sorted(times)
        assert all(p.feasible for p in preds)

    def test_longer_seq_costs_more(self):
        s = self.sim()
        a = s.best(1, 1024, 1024, 8, 64)
        b = s.best(1, 4096, 4096, 8, 64)
        assert b.t_total_us > a.t_total_us

    def test_matches_autotuner_scale(self):
        """Predicted best block sizes should be large tiles (the measured
        v5e sweet spot is 512x1024) — at minimum, not the smallest."""
        best = self.sim().best(4, 2048, 2048, 12, 64, causal=True)
        assert best.block_q >= 256 and best.block_kv >= 256


class TestTopologySimulator:
    def test_hop_distance_wraps(self):
        t = TopologySimulator((4, 4), caps=V5E)
        assert t.hop_distance((0, 0), (3, 0)) == 1  # wraps
        assert t.hop_distance((0, 0), (2, 2)) == 4
        assert t.max_hops() == 4

    def test_collective_costs_ordering(self):
        t = TopologySimulator((8,), caps=V5E)
        nbytes = 64e6
        psum = t.collective_cost("psum", nbytes)
        ag = t.collective_cost("all_gather", nbytes)
        pp = t.collective_cost("ppermute", nbytes)
        # all-reduce moves 2x all-gather's bytes
        assert abs(psum.t_us / ag.t_us - 2.0) < 0.01
        assert pp.hops == 1

    def test_unknown_collective_raises(self):
        t = TopologySimulator((4,), caps=V5E)
        with pytest.raises(ValueError):
            t.collective_cost("gossip", 1.0)

    def test_ring_overlap_improves_with_longer_local_seq(self):
        """Longer local sequences raise arithmetic intensity: compute
        grows O(S^2) while ring traffic grows O(S)."""
        t = TopologySimulator((4,), caps=V5E)
        short = t.ring_attention_overlap(1, 512, 8, 64)
        long = t.ring_attention_overlap(1, 8192, 8, 64)
        assert long["scaling_efficiency"] >= short["scaling_efficiency"]
        assert long["comm_hidden"]

    def test_64k_ring_meets_scaling_gate(self):
        """The BASELINE north star: >=85% scaling efficiency for ring
        attention at S=64K over 8 devices (8K local)."""
        t = TopologySimulator((8,), caps=V5E)
        r = t.ring_attention_overlap(1, 8192, 16, 128)
        assert r["scaling_efficiency"] >= 0.85

    def test_describe(self):
        t = TopologySimulator((2, 2, 2), caps=V5E)
        d = t.describe()
        assert d["devices"] == 8
        assert d["diameter_hops"] == 3
