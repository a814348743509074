"""Paged KV cache: allocation, append/gather round-trip, stats, OOM.

Mirrors the reference memory-manager contract (reference
core/memory_manager.py): allocate / free / stats / temporary context /
OOM accounting — re-expressed over pages.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from photonic_flash_attention_tpu.core.kv_cache import PagedKVCache
from photonic_flash_attention_tpu.utils.exceptions import KVCacheError

from ..conftest import rel_err_norm

H, D, PAGE = 2, 64, 16


def make_cache(num_pages=32, dtype=jnp.float32, **kw):
    kw.setdefault("max_pages_per_seq", 16)
    return PagedKVCache(num_pages, PAGE, H, D, dtype=dtype, **kw)


class TestAllocation:
    def test_allocate_free_cycle(self):
        c = make_cache()
        sid = c.allocate_sequence(40)  # 3 pages
        st = c.get_memory_stats()
        assert st["pages_used"] == 3
        c.free_sequence(sid)
        assert c.get_memory_stats()["pages_used"] == 0
        assert c.get_memory_stats()["free_count"] == 3

    def test_oom_raises_and_counts(self):
        c = make_cache(num_pages=2)
        c.allocate_sequence(2 * PAGE)
        with pytest.raises(KVCacheError):
            c.allocate_sequence(PAGE)
        assert c.get_memory_stats()["oom_events"] == 1

    def test_double_allocate_same_id(self):
        c = make_cache()
        c.allocate_sequence(0, seq_id=7)
        with pytest.raises(KVCacheError):
            c.allocate_sequence(0, seq_id=7)

    def test_free_unknown(self):
        c = make_cache()
        with pytest.raises(KVCacheError):
            c.free_sequence(99)

    def test_temporary_context(self):
        c = make_cache()
        with c.temporary_sequence(PAGE) as sid:
            assert c.get_memory_stats()["pages_used"] == 1
            assert c.sequence_length(sid) == 0
        assert c.get_memory_stats()["pages_used"] == 0

    def test_max_pages_per_seq(self):
        c = make_cache(num_pages=64, max_pages_per_seq=2)
        with pytest.raises(KVCacheError):
            c.allocate_sequence(3 * PAGE)


class TestAppendGather:
    def test_round_trip_bf16(self, rng):
        c = make_cache(dtype=jnp.bfloat16)
        sid = c.allocate_sequence()
        k = jnp.asarray(rng.standard_normal((40, H, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((40, H, D)), jnp.float32)
        c.append(sid, k, v)
        assert c.sequence_length(sid) == 40
        kg, vg = c.gather_kv(sid)
        assert kg.shape == (40, H, D)
        assert rel_err_norm(kg, k) < 0.02  # bf16 storage error
        assert rel_err_norm(vg, v) < 0.02

    def test_round_trip_int8(self, rng):
        c = make_cache(dtype=jnp.int8)
        sid = c.allocate_sequence()
        k = jnp.asarray(rng.standard_normal((33, H, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((33, H, D)), jnp.float32)
        c.append(sid, k, v)
        kg, vg = c.gather_kv(sid)
        assert rel_err_norm(kg, k) < 0.02  # per-token int8 scales
        assert rel_err_norm(vg, v) < 0.02

    def test_incremental_append_decode_style(self, rng):
        c = make_cache()
        sid = c.allocate_sequence()
        ks, vs = [], []
        for _ in range(20):  # 20 single-token appends crossing a page edge
            k = jnp.asarray(rng.standard_normal((1, H, D)), jnp.float32)
            v = jnp.asarray(rng.standard_normal((1, H, D)), jnp.float32)
            c.append(sid, k, v)
            ks.append(k)
            vs.append(v)
        kg, vg = c.gather_kv(sid)
        np.testing.assert_allclose(
            np.asarray(kg), np.asarray(jnp.concatenate(ks, 0)), rtol=1e-6
        )

    def test_page_table_shapes(self, rng):
        c = make_cache()
        s1 = c.allocate_sequence(PAGE)
        s2 = c.allocate_sequence(3 * PAGE)
        lengths, tables = c.page_table([s1, s2])
        assert lengths.shape == (2,)
        assert tables.shape == (2, 16)
        assert int(lengths[0]) == 0  # reserved but not yet written

    def test_pages_not_shared_between_sequences(self, rng):
        c = make_cache()
        s1 = c.allocate_sequence()
        s2 = c.allocate_sequence()
        k1 = jnp.ones((PAGE, H, D), jnp.float32)
        k2 = -jnp.ones((PAGE, H, D), jnp.float32)
        c.append(s1, k1, k1)
        c.append(s2, k2, k2)
        kg1, _ = c.gather_kv(s1)
        kg2, _ = c.gather_kv(s2)
        assert float(jnp.min(kg1)) == 1.0
        assert float(jnp.max(kg2)) == -1.0
