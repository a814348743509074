"""Unrolled-KV flash (ops/flash_unrolled.py) vs the oracle.

The round-5 VPU/MXU-overlap kernel: triangular static-extent calls for
causal, single full-extent call for non-causal, optional int8-QK.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from photonic_flash_attention_tpu.ops.flash_unrolled import (
    flash_attention_unrolled,
    unrolled_supported,
)
from photonic_flash_attention_tpu.ops.reference import attention_reference

from ..conftest import assert_close


def qkv(rng, b=2, s=512, h=4, hkv=None, d=64):
    hkv = hkv or h
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    return q, k, v


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestParity:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_oracle(self, rng, causal):
        q, k, v = qkv(rng)
        out = flash_attention_unrolled(
            q, k, v, causal=causal, block_q=128, block_kv=128
        )
        ref, _ = attention_reference(q, k, v, causal=causal)
        # The kernel computes in bf16 by design (also under interpret,
        # unlike the grid kernel's fp32 interpret math) -> bf16 atol.
        assert_close(out, ref, rtol=2e-2, atol=1e-2)

    @pytest.mark.parametrize("causal", [False, True])
    def test_gqa(self, rng, causal):
        q, _, _ = qkv(rng, h=8)
        _, k, v = qkv(rng, h=2)
        out = flash_attention_unrolled(
            q, k, v, causal=causal, block_q=128, block_kv=128
        )
        ref, _ = attention_reference(q, k, v, causal=causal)
        assert_close(out, ref, rtol=2e-2, atol=1e-2)

    def test_uneven_blocks(self, rng):
        """block_q != block_kv: diagonal extents still exact."""
        q, k, v = qkv(rng, s=768)
        out = flash_attention_unrolled(
            q, k, v, causal=True, block_q=256, block_kv=128
        )
        ref, _ = attention_reference(q, k, v, causal=True)
        assert_close(out, ref, rtol=2e-2, atol=1e-2)

    @pytest.mark.parametrize("causal", [False, True])
    def test_int8_qk(self, rng, causal):
        q, k, v = qkv(rng)
        out = flash_attention_unrolled(
            q, k, v, causal=causal, block_q=128, block_kv=128, int8_qk=True
        )
        ref, _ = attention_reference(q, k, v, causal=causal)
        # Same gate as the grid int8-QK kernel (reference gate: 0.1).
        err = float(
            jnp.linalg.norm((out - ref).astype(jnp.float32))
            / (jnp.linalg.norm(ref.astype(jnp.float32)) + 1e-9)
        )
        assert err < 0.05

    def test_bf16_io(self, rng):
        q, k, v = qkv(rng)
        out = flash_attention_unrolled(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), causal=True, block_q=128, block_kv=128,
        )
        assert out.dtype == jnp.bfloat16
        ref, _ = attention_reference(q, k, v, causal=True)
        assert_close(out.astype(jnp.float32), ref, rtol=5e-2, atol=2e-2)


class TestEnvelope:
    def test_supported_envelope(self):
        assert unrolled_supported(2048, 64)
        assert unrolled_supported(8192, 64)
        assert not unrolled_supported(16384, 64)  # 32 tiles > body limit
        assert not unrolled_supported(8192, 64, int8_qk=True)  # 16 > 12
        assert unrolled_supported(4096, 128)
        assert unrolled_supported(8192, 128)  # 4 MB K/V resident: fits
        assert not unrolled_supported(16384, 128)  # 32 tiles + 8 MB K/V
        assert not unrolled_supported(2000, 64)  # indivisible
        assert not unrolled_supported(4096, 64, block_q=1024)  # scoped OOM

    def test_rejects_indivisible_heads(self, rng):
        q, _, _ = qkv(rng, h=4)
        _, k, v = qkv(rng, h=3)
        with pytest.raises(ValueError):
            flash_attention_unrolled(q, k, v, block_q=128, block_kv=128)


class TestCoreIntegration:
    """flash_attention transparently uses the unrolled fwd (bf16, square,
    in-envelope) and the unrolled bwd — numerics stay in-gate."""

    def test_public_flash_routes_bf16_square(self, rng):
        from photonic_flash_attention_tpu.ops.flash import flash_attention

        q, k, v = qkv(rng, s=1024)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        out = flash_attention(qb, kb, vb, causal=True)
        ref, _ = attention_reference(q, k, v, causal=True)
        assert_close(out.astype(jnp.float32), ref, rtol=5e-2, atol=2e-2)

    @pytest.mark.parametrize("causal", [False, True])
    def test_bf16_grads_match_oracle(self, rng, causal):
        """jax.grad through flash_attention at a 512-multiple bf16 shape
        exercises BOTH round-5 unrolled kernels (fwd save_lse + bwd)."""
        import jax

        from photonic_flash_attention_tpu.ops.flash import flash_attention

        q, k, v = qkv(rng, b=1, s=1024, h=2)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

        def loss(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, causal=causal).astype(jnp.float32)
                ** 2
            )

        def ref_loss(q, k, v):
            o, _ = attention_reference(q, k, v, causal=causal)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2))(qb, kb, vb)
        refs = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for g, r in zip(grads, refs):
            # bf16 fwd + bf16-input bwd vs fp32 oracle: bf16-scale gate.
            rel = float(
                jnp.linalg.norm((g.astype(jnp.float32) - r).ravel())
                / (jnp.linalg.norm(r.ravel()) + 1e-9)
            )
            assert rel < 0.05, rel

    def test_gqa_bf16_grads(self, rng):
        import jax

        from photonic_flash_attention_tpu.ops.flash import flash_attention

        q, _, _ = qkv(rng, b=1, s=1024, h=4)
        _, k, v = qkv(rng, b=1, s=1024, h=2)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

        def loss(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, causal=True).astype(jnp.float32) ** 2
            )

        def ref_loss(q, k, v):
            o, _ = attention_reference(q, k, v, causal=True)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2))(qb, kb, vb)
        refs = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for g, r in zip(grads, refs):
            rel = float(
                jnp.linalg.norm((g.astype(jnp.float32) - r).ravel())
                / (jnp.linalg.norm(r.ravel()) + 1e-9)
            )
            assert rel < 0.05, rel


class TestKeyBias:
    """Round-5 second pass: per-key bias in the unrolled kernel — the
    engine's key-padded path rides it."""

    def test_k_bias_matches_oracle(self, rng):
        q, k, v = qkv(rng)
        bias = jnp.asarray(
            0.5 * rng.standard_normal((2, 512)), jnp.float32
        )
        out = flash_attention_unrolled(
            q, k, v, causal=True, block_q=128, block_kv=128, k_bias=bias
        )
        ref, _ = attention_reference(
            q, k, v, causal=True, bias=bias[:, None, None, :]
        )
        assert_close(out, ref, rtol=2e-2, atol=1e-2)

    def test_padding_mask_as_bias(self, rng):
        from photonic_flash_attention_tpu.ops.reference import (
            DEFAULT_MASK_VALUE,
        )

        q, k, v = qkv(rng)
        lens = jnp.asarray([400, 233], jnp.int32)
        keep = jnp.arange(512)[None] < lens[:, None]
        bias = jnp.where(keep, 0.0, DEFAULT_MASK_VALUE).astype(jnp.float32)
        out = flash_attention_unrolled(
            q, k, v, causal=True, block_q=128, block_kv=128, k_bias=bias
        )
        ref, _ = attention_reference(
            q, k, v, mask=keep[:, None, None, :], causal=True
        )
        assert_close(out, ref, rtol=2e-2, atol=1e-2)

    def test_engine_key_mask_can_route_unrolled(self, rng):
        import numpy as np

        from photonic_flash_attention_tpu.config import set_global_config
        from photonic_flash_attention_tpu.core.engine import AttentionEngine
        from photonic_flash_attention_tpu.core.router import (
            AdaptiveRouter,
            KernelKind,
            WorkloadCharacteristics,
        )

        set_global_config(auto_kernel_selection=True, flash_threshold=512)
        router = AdaptiveRouter(exploration_rate=0.0, seed=0)
        eng = AttentionEngine(router=router)
        b, s = 2, 1024
        q, k, v = qkv(rng, b=b, s=s)
        w = WorkloadCharacteristics(
            batch_size=b, q_len=s, kv_len=s, num_heads=4, head_dim=64,
            causal=True, mask_kind="key", dtype="float32", num_kv_heads=4,
        )
        # Seed tables so the measured router picks the unrolled kernel.
        for kind, ms in [
            (KernelKind.FUSED, 9.0),
            (KernelKind.FLASH, 3.0),
            (KernelKind.FLASH_UNROLLED, 1.0),
        ]:
            router.record_measurement(kind, w, ms)
        lens = jnp.asarray([700, 1000], jnp.int32)
        out, _ = eng(q, k, v, causal=True, kv_lens=lens)
        assert eng.last_kernel_used == "flash_unrolled"
        keep = jnp.arange(s)[None] < lens[:, None]
        ref, _ = attention_reference(
            q, k, v, mask=keep[:, None, None, :], causal=True
        )
        assert_close(out, ref, rtol=2e-2, atol=1e-2)


class TestWithLseBiasForm:
    """flash_attention_with_lse rides the unrolled kernel for bf16
    in-envelope shapes, converting kv_lens to the in-kernel bias form —
    including the zero-valid-keys contract ring merges rely on."""

    def test_lens_with_empty_sequence(self, rng):
        from photonic_flash_attention_tpu.ops.flash import (
            flash_attention_with_lse,
        )

        b, s = 3, 512
        q, k, v = qkv(rng, b=b, s=s)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        lens = jnp.asarray([512, 200, 0], jnp.int32)
        o, lse = flash_attention_with_lse(qb, kb, vb, kv_lens=lens)
        # Empty sequence: o = 0, lse = -inf (the grid kernel's contract).
        assert bool(jnp.all(o[2] == 0))
        assert bool(jnp.all(jnp.isinf(lse[2]) & (lse[2] < 0)))
        # Valid sequences match the masked oracle.
        keep = (jnp.arange(s)[None] < lens[:2, None])[:, None, None, :]
        ref, _ = attention_reference(q[:2], k[:2], v[:2], mask=keep)
        err = float(
            jnp.max(jnp.abs(o[:2].astype(jnp.float32) - ref))
        )
        assert err < 5e-2

    def test_lens_plus_bias_compose(self, rng):
        from photonic_flash_attention_tpu.ops.flash import (
            flash_attention_with_lse,
        )

        b, s = 2, 512
        q, k, v = qkv(rng, b=b, s=s)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        lens = jnp.asarray([400, 512], jnp.int32)
        bias = jnp.asarray(0.5 * rng.standard_normal((b, s)), jnp.float32)
        o, _ = flash_attention_with_lse(
            qb, kb, vb, causal=True, kv_lens=lens, k_bias=bias
        )
        keep = (jnp.arange(s)[None] < lens[:, None])[:, None, None, :]
        ref, _ = attention_reference(
            q, k, v, mask=keep, causal=True, bias=bias[:, None, None, :]
        )
        err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref)))
        assert err < 5e-2
