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

    def test_fused_decode_write_and_attend(self, rng, dtype):
        """paged_decode_attention must equal: scatter token -> attention."""
        from photonic_flash_attention_tpu.ops.paged import (
            paged_decode_attention,
            paged_attention_xla,
        )

        cache, q, lengths, tables, _ = build_cache_and_oracle(
            rng, [40, 17], dtype=dtype
        )
        quant = cache.k_scales is not None
        L = 2
        lyr = 1
        k5 = jnp.stack([cache.k_pages] * L)
        v5 = jnp.stack([cache.v_pages] * L)
        ks5 = jnp.stack([cache.k_scales] * L) if quant else None
        vs5 = jnp.stack([cache.v_scales] * L) if quant else None
        b, hq, d = q.shape
        hkv = cache.k_pages.shape[0]
        page = cache.k_pages.shape[-1]
        k_new = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.float32)
        # current token goes at position `length` (so new length below)
        new_lengths = lengths + 1
        pids = tables[jnp.arange(b), lengths // page]
        flat = pids * page + lengths % page

        outs = paged_decode_attention(
            q, k_new, v_new, k5, v5, new_lengths, tables, flat,
            jnp.int32(lyr), ks5, vs5,
        )
        if quant:
            o, k5o, v5o, ks5o, vs5o = outs
        else:
            o, k5o, v5o = outs
            ks5o = vs5o = None

        # Oracle: write (possibly quantized) token into a copy, then XLA
        # paged attention over layer lyr.
        kp = np.asarray(cache.k_pages.astype(jnp.float32)).copy()
        vp = np.asarray(cache.v_pages.astype(jnp.float32)).copy()
        ks = np.asarray(cache.k_scales).copy() if quant else None
        vs = np.asarray(cache.v_scales).copy() if quant else None

        def write(pool, scales, new):
            for b_ in range(b):
                pid, off = int(pids[b_]), int(lengths[b_] % page)
                col = np.asarray(new[b_], np.float32)  # (hkv, d)
                if quant:
                    s_ = np.abs(col).max(axis=1) / 127.0
                    s_ = np.where(s_ == 0, 1.0, s_)
                    q8 = np.clip(np.round(col / s_[:, None]), -127, 127)
                    pool[:, pid, :, off] = q8
                    scales[:, pid, off] = s_
                else:
                    pool[:, pid, :, off] = col

        write(kp, ks, k_new)
        write(vp, vs, v_new)
        ref = paged_attention_xla(
            q,
            jnp.asarray(kp, cache.k_pages.dtype),
            jnp.asarray(vp, cache.v_pages.dtype),
            new_lengths,
            tables,
            jnp.asarray(ks) if quant else None,
            jnp.asarray(vs) if quant else None,
        )
        assert rel_err_norm(o, ref) < 2e-2
        # untouched layer 0 must be bit-identical
        np.testing.assert_array_equal(
            np.asarray(k5o[0]).astype(np.float32),
            np.asarray(cache.k_pages).astype(np.float32),
        )
        # written layer contains the token
        got = np.asarray(k5o[lyr]).astype(np.float32)
        pid0, off0 = int(pids[0]), int(lengths[0] % page)
        assert not np.array_equal(
            got[:, pid0, :, off0],
            np.asarray(cache.k_pages).astype(np.float32)[:, pid0, :, off0],
        ) or quant is False and np.allclose(np.asarray(k_new[0]).T, 0)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8], ids=["f32", "int8"])
class TestPagedHeadFolded:
    """Round-4 bandwidth-first head-folded kernel (paged_attention_hf)."""

    def test_matches_oracle(self, rng, dtype):
        from photonic_flash_attention_tpu.ops.paged import paged_attention_hf

        cache, q, lengths, tables, ref = build_cache_and_oracle(
            rng, [40, 17, 128, 3], dtype=dtype
        )
        out = paged_attention_hf(
            q, cache.k_pages, cache.v_pages, lengths, tables,
            cache.k_scales, cache.v_scales, pages_per_block=2,
        )
        assert out.shape == q.shape
        assert rel_err_norm(out, ref) < 2e-2

    def test_int8_compute_path(self, rng, dtype):
        from photonic_flash_attention_tpu.ops.paged import paged_attention_hf

        cache, q, lengths, tables, ref = build_cache_and_oracle(
            rng, [64, 33], dtype=dtype
        )
        out = paged_attention_hf(
            q, cache.k_pages, cache.v_pages, lengths, tables,
            cache.k_scales, cache.v_scales, pages_per_block=2,
            int8_compute=(dtype == jnp.int8),
        )
        # per-tensor q quant + per-row int8 P requant: looser than the
        # float-compute path but inside the reference's 0.1 gate.
        assert rel_err_norm(out, ref) < (3e-2 if dtype == jnp.int8 else 2e-2)

    def test_gqa_and_empty_slot(self, rng, dtype):
        from photonic_flash_attention_tpu.ops.paged import paged_attention_hf

        cache, q, lengths, tables, ref = build_cache_and_oracle(
            rng, [40, 17], dtype=dtype, hq=4
        )
        # Append an EMPTY serving slot (length 0, trash page table row):
        # its output is unspecified but must not corrupt other rows.
        lengths = jnp.concatenate([lengths, jnp.zeros((1,), jnp.int32)])
        tables = jnp.concatenate([tables, jnp.zeros_like(tables[:1])])
        q = jnp.concatenate([q, q[:1]])
        out = paged_attention_hf(
            q, cache.k_pages, cache.v_pages, lengths, tables,
            cache.k_scales, cache.v_scales, pages_per_block=2,
        )
        assert rel_err_norm(out[:2], ref) < 2e-2
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_cross_sequence_pipelining_num_buffers(self, rng, dtype):
        from photonic_flash_attention_tpu.ops.paged import paged_attention_hf

        cache, q, lengths, tables, ref = build_cache_and_oracle(
            rng, [128, 128, 96], dtype=dtype
        )
        for nbuf in (2, 3):
            out = paged_attention_hf(
                q, cache.k_pages, cache.v_pages, lengths, tables,
                cache.k_scales, cache.v_scales, pages_per_block=2,
                num_buffers=nbuf,
            )
            assert rel_err_norm(out, ref) < 2e-2, nbuf
