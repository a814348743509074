"""Paged decode kernels vs dense oracle (bf16 and int8 pages)."""

import jax.numpy as jnp
import numpy as np
import pytest

from photonic_flash_attention_tpu.core.kv_cache import PagedKVCache
from photonic_flash_attention_tpu.ops.paged import paged_attention, paged_attention_xla
from photonic_flash_attention_tpu.ops.reference import attention_reference

from ..conftest import rel_err_norm

HKV, D, PAGE = 2, 64, 16


def build_cache_and_oracle(rng, lengths, dtype=jnp.float32, hq=4):
    """Fill a cache with random KV per sequence; return kernel inputs and
    the dense-oracle output."""
    cache = PagedKVCache(
        num_pages=128, page_size=PAGE, num_kv_heads=HKV, head_dim=D,
        dtype=dtype, max_pages_per_seq=8,
    )
    b = len(lengths)
    q = jnp.asarray(rng.standard_normal((b, hq, D)), jnp.float32)
    sids, refs = [], []
    for i, L in enumerate(lengths):
        sid = cache.allocate_sequence()
        k = jnp.asarray(rng.standard_normal((L, HKV, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((L, HKV, D)), jnp.float32)
        cache.append(sid, k, v)
        sids.append(sid)
        # Oracle on the *stored* (possibly quantized) KV so we measure the
        # kernel, not the storage quantization.
        kg, vg = cache.gather_kv(sid)
        ref, _ = attention_reference(
            q[i : i + 1, None], kg[None], vg[None]
        )
        refs.append(ref[0, 0])  # (hq, D)
    lengths_arr, tables = cache.page_table(sids)
    return cache, q, lengths_arr, tables, jnp.stack(refs)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8], ids=["f32", "int8"])
class TestPagedXLA:
    def test_matches_oracle(self, rng, dtype):
        cache, q, lengths, tables, ref = build_cache_and_oracle(
            rng, [40, 17, 128], dtype=dtype
        )
        out = paged_attention_xla(
            q, cache.k_pages, cache.v_pages, lengths, tables,
            cache.k_scales, cache.v_scales,
        )
        assert out.shape == q.shape
        assert rel_err_norm(out, ref) < 2e-2


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8], ids=["f32", "int8"])
class TestPagedPallas:
    def test_matches_oracle(self, rng, dtype):
        cache, q, lengths, tables, ref = build_cache_and_oracle(
            rng, [40, 17, 128], dtype=dtype
        )
        out = paged_attention(
            q, cache.k_pages, cache.v_pages, lengths, tables,
            cache.k_scales, cache.v_scales, pages_per_block=2,
        )
        assert out.shape == q.shape
        assert rel_err_norm(out, ref) < 2e-2

    def test_single_sequence_single_page(self, rng, dtype):
        cache, q, lengths, tables, ref = build_cache_and_oracle(
            rng, [7], dtype=dtype
        )
        out = paged_attention(
            q, cache.k_pages, cache.v_pages, lengths, tables,
            cache.k_scales, cache.v_scales, pages_per_block=2,
        )
        assert rel_err_norm(out, ref) < 2e-2

    def test_gqa_group(self, rng, dtype):
        cache, q, lengths, tables, ref = build_cache_and_oracle(
            rng, [64, 32], dtype=dtype, hq=8
        )
        out = paged_attention(
            q, cache.k_pages, cache.v_pages, lengths, tables,
            cache.k_scales, cache.v_scales, pages_per_block=2,
        )
        assert rel_err_norm(out, ref) < 2e-2


class TestLayerIndexedPools:
    """Rank-5 (L, ...) pools with a scalar layer index + aliased flow-through."""

    def test_layer_indexed_matches_rank4(self, rng, dtype):
        cache, q, lengths, tables, ref = build_cache_and_oracle(
            rng, [40, 17, 128], dtype=dtype
        )
        L = 3
        lyr = 1
        # Stack the same pool at every layer; index the middle one.
        k5 = jnp.stack([cache.k_pages] * L)
        v5 = jnp.stack([cache.v_pages] * L)
        ks5 = jnp.stack([cache.k_scales] * L) if cache.k_scales is not None else None
        vs5 = jnp.stack([cache.v_scales] * L) if cache.v_scales is not None else None
        out = paged_attention(
            q, k5, v5, lengths, tables, ks5, vs5,
            pages_per_block=2, layer=jnp.int32(lyr),
        )
        assert rel_err_norm(out, ref) < 2e-2

    def test_alias_pools_flow_through(self, rng, dtype):
        cache, q, lengths, tables, ref = build_cache_and_oracle(
            rng, [40, 17], dtype=dtype
        )
        quant = cache.k_scales is not None
        outs = paged_attention(
            q, cache.k_pages, cache.v_pages, lengths, tables,
            cache.k_scales, cache.v_scales, pages_per_block=2,
            alias_pools=True,
        )
        if quant:
            out, k_out, v_out, ks_out, vs_out = outs
            assert ks_out.shape == cache.k_scales.shape
            np.testing.assert_array_equal(np.asarray(ks_out), np.asarray(cache.k_scales))
        else:
            out, k_out, v_out = outs
        assert k_out.shape == cache.k_pages.shape
        np.testing.assert_array_equal(
            np.asarray(k_out).astype(np.float32),
            np.asarray(cache.k_pages).astype(np.float32),
        )
        assert rel_err_norm(out, ref) < 2e-2
