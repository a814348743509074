"""Ring attention on an 8-virtual-device mesh vs the single-device oracle.

This is the "distributed testing without a cluster" strategy (SURVEY.md
§4): CPU backend + ``--xla_force_host_platform_device_count=8`` exercises
real ppermute collectives and shard_map partitioning.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photonic_flash_attention_tpu.ops.reference import attention_reference
from photonic_flash_attention_tpu.parallel.mesh import create_mesh
from photonic_flash_attention_tpu.parallel.ring import (
    make_ring_attention,
    ring_attention,
    ring_attention_grad,
    softmax_merge,
)

from ..conftest import assert_close


def make_qkv(rng, b=1, s=512, h=4, d=64):
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    return q, k, v


class TestSoftmaxMerge:
    def test_merge_two_halves_equals_full(self, rng):
        from photonic_flash_attention_tpu.ops.flash import flash_attention_with_lse

        q, k, v = make_qkv(rng, s=256)
        o_full, _ = attention_reference(q, k, v)
        o1, l1 = flash_attention_with_lse(q, k[:, :128], v[:, :128])
        o2, l2 = flash_attention_with_lse(q, k[:, 128:], v[:, 128:])
        o, _ = softmax_merge(o1, l1, o2, l2)
        assert_close(o, o_full)

    def test_merge_with_masked_partial(self, rng):
        q, k, v = make_qkv(rng, s=128)
        o1, _ = attention_reference(q, k, v)
        from photonic_flash_attention_tpu.ops.flash import flash_attention_with_lse

        oa, la = flash_attention_with_lse(q, k, v)
        zero = jnp.zeros_like(oa)
        neg = jnp.full(la.shape, -jnp.inf)
        o, lse = softmax_merge(oa, la, zero, neg)
        assert_close(o, o1)
        o, lse = softmax_merge(zero, neg, oa, la)
        assert_close(o, o1)


@pytest.mark.parametrize("n_seq", [2, 4, 8])
class TestRingSharded:
    def test_full_attention(self, rng, n_seq):
        q, k, v = make_qkv(rng, s=64 * n_seq)
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ring_attention(mesh, data_axis=None, model_axis=None)
        out = fn(q, k, v)
        ref, _ = attention_reference(q, k, v)
        assert_close(out, ref)

    def test_causal(self, rng, n_seq):
        q, k, v = make_qkv(rng, s=64 * n_seq)
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ring_attention(mesh, data_axis=None, model_axis=None, causal=True)
        out = fn(q, k, v)
        ref, _ = attention_reference(q, k, v, causal=True)
        assert_close(out, ref)


class TestRing2D:
    def test_heads_by_seq_mesh(self, rng):
        """2D head x context parallelism (guide §16 pattern)."""
        q, k, v = make_qkv(rng, s=256, h=4)
        mesh = create_mesh((2, 4), ("model", "seq"), jax.devices()[:8])
        fn = make_ring_attention(mesh, data_axis=None, causal=True)
        out = fn(q, k, v)
        ref, _ = attention_reference(q, k, v, causal=True)
        assert_close(out, ref)

    def test_data_by_seq_mesh(self, rng):
        q, k, v = make_qkv(rng, b=2, s=256, h=4)
        mesh = create_mesh((2, 4), ("data", "seq"), jax.devices()[:8])
        fn = make_ring_attention(mesh, model_axis=None, causal=True)
        out = fn(q, k, v)
        ref, _ = attention_reference(q, k, v, causal=True)
        assert_close(out, ref)


class TestRingGrad:
    """Differentiable ring attention vs jax.grad through the oracle."""

    def _ref_grads(self, q, k, v, causal):
        def loss(q, k, v):
            o, _ = attention_reference(q, k, v, causal=causal)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("n_seq", [2, 4])
    def test_grads_match_oracle(self, rng, causal, n_seq):
        q, k, v = make_qkv(rng, s=64 * n_seq)
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ring_attention(
            mesh, data_axis=None, model_axis=None, causal=causal,
            differentiable=True,
        )

        def loss(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        rq, rk, rv = self._ref_grads(q, k, v, causal)
        assert_close(dq, rq, rtol=2e-2, atol=2e-3)
        assert_close(dk, rk, rtol=2e-2, atol=2e-3)
        assert_close(dv, rv, rtol=2e-2, atol=2e-3)

    def test_forward_matches_inference_path(self, rng):
        q, k, v = make_qkv(rng, s=256)
        mesh = create_mesh((4,), ("seq",), jax.devices()[:4])
        fn_g = make_ring_attention(
            mesh, data_axis=None, model_axis=None, causal=True,
            differentiable=True,
        )
        fn_i = make_ring_attention(
            mesh, data_axis=None, model_axis=None, causal=True
        )
        assert_close(fn_g(q, k, v), fn_i(q, k, v))

    @pytest.mark.parametrize("causal", [False, True])
    def test_gqa_grads_match_oracle(self, rng, causal):
        """Sequence-parallel GQA training (Llama-family): Hkv < Hq grads
        match the oracle on an 8-device mesh (VERDICT r2 item #10)."""
        n_seq = 8
        q, _, _ = make_qkv(rng, s=64 * n_seq, h=4)
        _, k, v = make_qkv(rng, s=64 * n_seq, h=2)
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ring_attention(
            mesh, data_axis=None, model_axis=None, causal=causal,
            differentiable=True,
        )

        def loss(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        rq, rk, rv = self._ref_grads(q, k, v, causal)
        assert_close(dq, rq, rtol=2e-2, atol=2e-3)
        assert_close(dk, rk, rtol=2e-2, atol=2e-3)
        assert_close(dv, rv, rtol=2e-2, atol=2e-3)

    def test_rejects_indivisible_heads(self, rng):
        q, _, _ = make_qkv(rng, s=128, h=4)
        _, k, v = make_qkv(rng, s=128, h=3)
        mesh = create_mesh((2,), ("seq",), jax.devices()[:2])
        fn = make_ring_attention(
            mesh, data_axis=None, model_axis=None, differentiable=True
        )
        with pytest.raises(ValueError, match="multiple of Hkv"):
            fn(q, k, v)


class TestRingDtypes:
    def test_bf16_inputs(self, rng):
        """Regression: bf16 inputs must not break the fori_loop carry
        (the merge accumulates in fp32; output returns in bf16)."""
        q, k, v = make_qkv(rng, s=256)
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
        mesh = create_mesh((4,), ("seq",), jax.devices()[:4])
        fn = make_ring_attention(mesh, data_axis=None, model_axis=None, causal=True)
        out = fn(q, k, v)
        assert out.dtype == jnp.bfloat16
        ref, _ = attention_reference(q, k, v, causal=True)
        assert_close(out, ref)


class TestRing64K:
    """The BASELINE north-star config (ring at S=64K) exercised for real:
    8-way sequence-parallel ring at 65536 tokens vs the independently-
    derived blockwise-XLA oracle (VERDICT r2 missing #7 / item #5)."""

    def test_ring_64k_matches_blockwise_oracle(self, rng):
        from photonic_flash_attention_tpu.ops.reference import (
            attention_blockwise,
        )

        S, H, D = 65536, 1, 8  # tiny H/D so the oracle fits/finishes
        q = jnp.asarray(rng.standard_normal((1, S, H, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, S, H, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, S, H, D)), jnp.float32)
        mesh = create_mesh((8,), ("seq",), jax.devices()[:8])
        fn = make_ring_attention(
            mesh, data_axis=None, model_axis=None, causal=True
        )
        out = fn(q, k, v)
        ref = attention_blockwise(q, k, v, causal=True, block_kv=2048)
        err = float(
            jnp.linalg.norm((out - ref).astype(jnp.float32))
            / jnp.linalg.norm(ref.astype(jnp.float32))
        )
        assert err < 2e-3, f"ring@64K rel err {err}"


class TestRingKeyPadding:
    """Ring attention over PADDED batches (VERDICT r3 weak #4): global
    kv_lens clip per shard, k_bias shards rotate with KV. Oracle is the
    dense-mask reference."""

    @staticmethod
    def _lens_mask(lens, skv):
        keep = jnp.arange(skv, dtype=jnp.int32)[None] < lens[:, None]
        return keep[:, None, None, :]

    @pytest.mark.parametrize("causal", [False, True])
    def test_kv_lens_matches_oracle(self, rng, causal):
        b, s, n_seq = 3, 512, 4
        q, k, v = make_qkv(rng, b=b, s=s)
        # Unaligned lens: mid-shard, one-shard, full-length.
        lens = jnp.array([200, 128, s], jnp.int32)
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ring_attention(
            mesh, data_axis=None, model_axis=None, causal=causal
        )
        out = fn(q, k, v, kv_lens=lens)
        ref, _ = attention_reference(
            q, k, v, self._lens_mask(lens, s), causal=causal
        )
        assert_close(out, ref)

    def test_k_bias_matches_oracle(self, rng):
        b, s, n_seq = 2, 256, 2
        q, k, v = make_qkv(rng, b=b, s=s)
        k_bias = jnp.asarray(
            rng.standard_normal((b, s)), jnp.float32
        )
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ring_attention(mesh, data_axis=None, model_axis=None)
        out = fn(q, k, v, k_bias=k_bias)
        ref, _ = attention_reference(
            q, k, v, bias=k_bias[:, None, None, :]
        )
        assert_close(out, ref)

    def test_lens_and_bias_combined(self, rng):
        b, s, n_seq = 2, 512, 4
        q, k, v = make_qkv(rng, b=b, s=s)
        lens = jnp.array([300, 512], jnp.int32)
        k_bias = jnp.asarray(rng.standard_normal((b, s)), jnp.float32)
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ring_attention(mesh, data_axis=None, model_axis=None)
        out = fn(q, k, v, kv_lens=lens, k_bias=k_bias)
        ref, _ = attention_reference(
            q, k, v, self._lens_mask(lens, s),
            bias=k_bias[:, None, None, :],
        )
        assert_close(out, ref)

    def test_short_lens_skip_far_shards(self, rng):
        """Lens inside the first shard: later shards contribute nothing
        (exercises the all-zero-lens shard skip path)."""
        b, s, n_seq = 2, 1024, 8
        q, k, v = make_qkv(rng, b=b, s=s)
        lens = jnp.array([100, 60], jnp.int32)
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ring_attention(mesh, data_axis=None, model_axis=None)
        out = fn(q, k, v, kv_lens=lens)
        ref, _ = attention_reference(q, k, v, self._lens_mask(lens, s))
        assert_close(out, ref)

    def test_data_sharded_batch_with_lens(self, rng):
        """kv_lens shard on the data axis alongside the batch."""
        b, s = 4, 256
        q, k, v = make_qkv(rng, b=b, s=s)
        lens = jnp.array([100, 256, 37, 200], jnp.int32)
        mesh = create_mesh((2, 4), ("data", "seq"), jax.devices()[:8])
        fn = make_ring_attention(mesh, model_axis=None, causal=True)
        out = fn(q, k, v, kv_lens=lens)
        ref, _ = attention_reference(
            q, k, v, self._lens_mask(lens, s), causal=True
        )
        assert_close(out, ref)

    def test_differentiable_ring_accepts_bias(self, rng):
        """Round 5 (VERDICT r4 #6): the differentiable ring threads
        k_bias; a zero bias must match the no-bias forward exactly."""
        q, k, v = make_qkv(rng, s=256)
        bias = jnp.zeros((1, 256), jnp.float32)
        mesh = create_mesh((2,), ("seq",), jax.devices()[:2])
        fn = make_ring_attention(
            mesh, data_axis=None, model_axis=None, differentiable=True
        )
        assert_close(fn(q, k, v, k_bias=bias), fn(q, k, v))

    @pytest.mark.parametrize("causal", [False, True])
    def test_padded_grads_match_oracle(self, rng, causal):
        """Sequence-parallel TRAINING over a padded batch: both ring
        passes thread kv_lens; grads match jax.grad through the
        masked oracle (dk/dv vanish past each sequence's end)."""
        b, s, n_seq = 2, 256, 4
        q, k, v = make_qkv(rng, b=b, s=s)
        lens = jnp.array([150, 256], jnp.int32)
        keep = jnp.arange(s, dtype=jnp.int32)[None] < lens[:, None]
        mask = keep[:, None, None, :]
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ring_attention(
            mesh, data_axis=None, model_axis=None, causal=causal,
            differentiable=True,
        )

        def loss(q, k, v):
            return jnp.sum(
                fn(q, k, v, kv_lens=lens).astype(jnp.float32) ** 2
            )

        def ref_loss(q, k, v):
            o, _ = attention_reference(q, k, v, mask, causal=causal)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        rq, rk, rv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        assert_close(dq, rq, rtol=2e-2, atol=2e-3)
        assert_close(dk, rk, rtol=2e-2, atol=2e-3)
        assert_close(dv, rv, rtol=2e-2, atol=2e-3)
        # Keys past the end get exactly zero gradient.
        assert float(jnp.max(jnp.abs(dk[0, 150:]))) == 0.0
        assert float(jnp.max(jnp.abs(dv[0, 150:]))) == 0.0


class TestRingGQAPadded:
    def test_gqa_with_kv_lens(self, rng):
        """GQA (Hkv < Hq) composed with key padding through the ring."""
        b, s, hq, hkv, d, n_seq = 2, 512, 8, 2, 64, 4
        q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
        lens = jnp.array([300, 512], jnp.int32)
        keep = jnp.arange(s, dtype=jnp.int32)[None] < lens[:, None]
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ring_attention(
            mesh, data_axis=None, model_axis=None, causal=True
        )
        out = fn(q, k, v, kv_lens=lens)
        ref, _ = attention_reference(
            q, k, v, keep[:, None, None, :], causal=True
        )
        assert_close(out, ref)


class TestRingBiasGrads:
    """Differentiable ring attention WITH a per-key bias (VERDICT r4 #6):
    the bias shard and its grad accumulator rotate with their KV block in
    the backward; grads — including the bias cotangent — match jax.grad
    through the oracle."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_k_bias_grads_match_oracle(self, rng, causal):
        b, s, n_seq = 2, 256, 4
        q, k, v = make_qkv(rng, b=b, s=s)
        k_bias = jnp.asarray(0.5 * rng.standard_normal((b, s)), jnp.float32)
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ring_attention(
            mesh, data_axis=None, model_axis=None, causal=causal,
            differentiable=True,
        )

        def loss(q, k, v, kb):
            return jnp.sum(fn(q, k, v, k_bias=kb).astype(jnp.float32) ** 2)

        def ref_loss(q, k, v, kb):
            o, _ = attention_reference(
                q, k, v, causal=causal, bias=kb[:, None, None, :]
            )
            return jnp.sum(o.astype(jnp.float32) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, k_bias)
        refs = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(q, k, v, k_bias)
        for g, r in zip(grads, refs):
            assert_close(g, r, rtol=2e-2, atol=2e-3)

    def test_k_bias_with_lens_grads_match_oracle(self, rng):
        """Padded batch + scattered key bias under autograd — the full
        round-4 forward composition, now differentiable."""
        b, s, n_seq = 2, 256, 4
        q, k, v = make_qkv(rng, b=b, s=s)
        k_bias = jnp.asarray(0.5 * rng.standard_normal((b, s)), jnp.float32)
        lens = jnp.asarray([200, 129], jnp.int32)
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ring_attention(
            mesh, data_axis=None, model_axis=None, causal=True,
            differentiable=True,
        )

        def loss(q, k, v, kb):
            return jnp.sum(
                fn(q, k, v, kv_lens=lens, k_bias=kb).astype(jnp.float32) ** 2
            )

        def ref_loss(q, k, v, kb):
            keep = (
                jnp.arange(s, dtype=jnp.int32)[None] < lens[:, None]
            )[:, None, None, :]
            o, _ = attention_reference(
                q, k, v, mask=keep, causal=True,
                bias=kb[:, None, None, :],
            )
            return jnp.sum(o.astype(jnp.float32) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, k_bias)
        refs = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(q, k, v, k_bias)
        for g, r in zip(grads, refs):
            assert_close(g, r, rtol=2e-2, atol=2e-3)

    def test_gqa_bias_grads_match_oracle(self, rng):
        b, s, n_seq = 1, 256, 4
        q, _, _ = make_qkv(rng, b=b, s=s, h=4)
        _, k, v = make_qkv(rng, b=b, s=s, h=2)
        k_bias = jnp.asarray(0.5 * rng.standard_normal((b, s)), jnp.float32)
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ring_attention(
            mesh, data_axis=None, model_axis=None, causal=True,
            differentiable=True,
        )

        def loss(q, k, v, kb):
            return jnp.sum(fn(q, k, v, k_bias=kb).astype(jnp.float32) ** 2)

        def ref_loss(q, k, v, kb):
            o, _ = attention_reference(
                q, k, v, causal=True, bias=kb[:, None, None, :]
            )
            return jnp.sum(o.astype(jnp.float32) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, k_bias)
        refs = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(q, k, v, k_bias)
        for g, r in zip(grads, refs):
            assert_close(g, r, rtol=2e-2, atol=2e-3)
