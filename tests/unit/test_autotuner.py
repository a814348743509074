"""Autotuner candidate model + profile store unit tests."""

import jax.numpy as jnp
import numpy as np

from photonic_flash_attention_tpu.core.autotuner import (
    Autotuner,
    TuneResult,
    candidate_blocks,
)


class TestCandidateBlocks:
    def test_d128_includes_1024_square(self):
        """The corrected VMEM model (only streamed q/k/v tiles are
        double-buffered) must admit the measured-fastest D=128 int8-QK
        tile (benchmarks/flash_d128_sweep.py)."""
        assert (1024, 1024) in candidate_blocks(4096, 4096, 128)

    def test_small_seq_clamps(self):
        cands = candidate_blocks(256, 256, 64)
        assert all(bq <= 256 and bkv <= 256 for bq, bkv in cands)
        assert cands  # never empty

    def test_vmem_budget_excludes_oversized(self):
        # At a (hypothetical) giant head dim the score tile dominates:
        # the largest tiles must be filtered out.
        cands = candidate_blocks(8192, 8192, 512)
        assert (1024, 2048) not in cands

    def test_never_empty_fallback(self):
        assert candidate_blocks(64, 64, 64) == [(128, 128)]


class TestProfileStore:
    def test_record_lookup_roundtrip(self, tmp_path):
        p = str(tmp_path / "p.json")
        t = Autotuner(state_path=p)
        key = Autotuner.profile_key(2048, 2048, 64, 4, 12)
        t.record(key, TuneResult(512, 512, 0.5))
        got = t.lookup(key)
        assert (got.block_q, got.block_kv) == (512, 512)
        t.save_state()
        # persisted: a fresh instance reloads it
        t2 = Autotuner(state_path=p)
        got2 = t2.lookup(key)
        assert got2 is not None and got2.block_q == 512


class TestDAwareDefaults:
    def test_int8qk_picks_1024_at_d128(self):
        """Default-block resolution inside flash_attention_int8qk:
        D>=128 with 1024-divisible seq -> 1024 tiles (interpret mode,
        shape check only)."""
        from photonic_flash_attention_tpu.ops.flash_fp8 import (
            flash_attention_int8qk,
        )

        rng = np.random.default_rng(0)
        # 1024-divisible seq at D=128: runs with the big default tiles.
        q = jnp.asarray(rng.standard_normal((1, 1024, 2, 128)), jnp.float32)
        out = flash_attention_int8qk(q, q, q, causal=True, interpret=True)
        assert out.shape == q.shape
        # Non-1024-divisible seq still works (512 default, padded).
        q2 = jnp.asarray(rng.standard_normal((1, 640, 2, 128)), jnp.float32)
        out2 = flash_attention_int8qk(q2, q2, q2, interpret=True)
        assert out2.shape == q2.shape
