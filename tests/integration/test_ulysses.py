"""Ulysses all-to-all sequence parallelism vs the single-device oracle.

Same virtual-mesh strategy as the ring tests (SURVEY.md §4): real
``all_to_all`` collectives on an 8-virtual-device CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photonic_flash_attention_tpu.ops.reference import attention_reference
from photonic_flash_attention_tpu.parallel.mesh import create_mesh
from photonic_flash_attention_tpu.parallel.ulysses import make_ulysses_attention
from photonic_flash_attention_tpu.utils.exceptions import DistributionError

from ..conftest import assert_close


def make_qkv(rng, b=1, s=512, h=8, d=64):
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("n_seq", [2, 4, 8])
class TestUlyssesSharded:
    def test_full_attention(self, rng, n_seq):
        q, k, v = make_qkv(rng, s=64 * n_seq)
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ulysses_attention(mesh, data_axis=None)
        out = fn(q, k, v)
        ref, _ = attention_reference(q, k, v)
        assert_close(out, ref)

    def test_causal(self, rng, n_seq):
        q, k, v = make_qkv(rng, s=64 * n_seq)
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ulysses_attention(mesh, data_axis=None, causal=True)
        out = fn(q, k, v)
        ref, _ = attention_reference(q, k, v, causal=True)
        assert_close(out, ref)


class TestUlysses2D:
    def test_data_by_seq_mesh(self, rng):
        q, k, v = make_qkv(rng, b=2, s=256)
        mesh = create_mesh((2, 4), ("data", "seq"), jax.devices()[:8])
        fn = make_ulysses_attention(mesh, causal=True)
        out = fn(q, k, v)
        ref, _ = attention_reference(q, k, v, causal=True)
        assert_close(out, ref)

    def test_matches_ring(self, rng):
        from photonic_flash_attention_tpu.parallel.ring import make_ring_attention

        q, k, v = make_qkv(rng, s=256)
        mesh = create_mesh((4,), ("seq",), jax.devices()[:4])
        uly = make_ulysses_attention(mesh, data_axis=None, causal=True)
        ring = make_ring_attention(
            mesh, data_axis=None, model_axis=None, causal=True
        )
        assert_close(uly(q, k, v), ring(q, k, v))

    def test_indivisible_heads_rejected(self, rng):
        q, k, v = make_qkv(rng, s=128, h=6)
        mesh = create_mesh((4,), ("seq",), jax.devices()[:4])
        fn = make_ulysses_attention(mesh, data_axis=None)
        with pytest.raises(DistributionError):
            fn(q, k, v)


class TestUlyssesGrad:
    """Ulysses is differentiable end-to-end: the local flash kernel has a
    custom VJP and all_to_all transposes to all_to_all."""

    def test_grads_match_oracle(self, rng):
        q, k, v = make_qkv(rng, s=256, h=8)
        mesh = create_mesh((4,), ("seq",), jax.devices()[:4])
        fn = make_ulysses_attention(mesh, data_axis=None, causal=True)

        def loss(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

        def ref_loss(q, k, v):
            o, _ = attention_reference(q, k, v, causal=True)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        rq, rk, rv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        assert_close(dq, rq, rtol=2e-2, atol=2e-3)
        assert_close(dk, rk, rtol=2e-2, atol=2e-3)
        assert_close(dv, rv, rtol=2e-2, atol=2e-3)


class TestUlyssesKeyPadding:
    """Key padding through Ulysses: global lens apply unchanged to the
    device-resident full sequence after the all_to_all; bias shards
    all-gather."""

    @staticmethod
    def _lens_mask(lens, skv):
        keep = jnp.arange(skv, dtype=jnp.int32)[None] < lens[:, None]
        return keep[:, None, None, :]

    @pytest.mark.parametrize("causal", [False, True])
    def test_kv_lens_matches_oracle(self, rng, causal):
        b, s, n_seq = 2, 512, 4
        q, k, v = make_qkv(rng, b=b, s=s)
        lens = jnp.array([200, 512], jnp.int32)
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ulysses_attention(mesh, data_axis=None, causal=causal)
        out = fn(q, k, v, kv_lens=lens)
        ref, _ = attention_reference(
            q, k, v, self._lens_mask(lens, s), causal=causal
        )
        assert_close(out, ref)

    def test_lens_and_bias_combined(self, rng):
        b, s, n_seq = 2, 256, 2
        q, k, v = make_qkv(rng, b=b, s=s)
        lens = jnp.array([100, 256], jnp.int32)
        k_bias = jnp.asarray(rng.standard_normal((b, s)), jnp.float32)
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ulysses_attention(mesh, data_axis=None)
        out = fn(q, k, v, kv_lens=lens, k_bias=k_bias)
        ref, _ = attention_reference(
            q, k, v, self._lens_mask(lens, s),
            bias=k_bias[:, None, None, :],
        )
        assert_close(out, ref)

    def test_matches_ring_with_lens(self, rng):
        from photonic_flash_attention_tpu.parallel.ring import make_ring_attention

        q, k, v = make_qkv(rng, b=2, s=256)
        lens = jnp.array([130, 256], jnp.int32)
        mesh = create_mesh((4,), ("seq",), jax.devices()[:4])
        uly = make_ulysses_attention(mesh, data_axis=None, causal=True)
        ring = make_ring_attention(
            mesh, data_axis=None, model_axis=None, causal=True
        )
        assert_close(
            uly(q, k, v, kv_lens=lens), ring(q, k, v, kv_lens=lens)
        )


class TestUlyssesGQA:
    def test_gqa_matches_oracle(self, rng):
        """GQA through ulysses: both head axes divide the seq axis."""
        b, s, hq, hkv, d, n_seq = 1, 512, 8, 4, 64, 4
        np_rng = np.random.default_rng(3)
        q = jnp.asarray(np_rng.standard_normal((b, s, hq, d)), jnp.float32)
        k = jnp.asarray(np_rng.standard_normal((b, s, hkv, d)), jnp.float32)
        v = jnp.asarray(np_rng.standard_normal((b, s, hkv, d)), jnp.float32)
        mesh = create_mesh((n_seq,), ("seq",), jax.devices()[:n_seq])
        fn = make_ulysses_attention(mesh, data_axis=None, causal=True)
        out = fn(q, k, v)
        ref, _ = attention_reference(q, k, v, causal=True)
        assert_close(out, ref)

    def test_gqa_indivisible_kv_heads_rejected(self, rng):
        np_rng = np.random.default_rng(3)
        q = jnp.asarray(np_rng.standard_normal((1, 512, 8, 64)), jnp.float32)
        k = jnp.asarray(np_rng.standard_normal((1, 512, 2, 64)), jnp.float32)
        mesh = create_mesh((4,), ("seq",), jax.devices()[:4])
        fn = make_ulysses_attention(mesh, data_axis=None)
        with pytest.raises(DistributionError):
            fn(q, k, k)
