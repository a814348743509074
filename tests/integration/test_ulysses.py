"""Ulysses all-to-all sequence parallelism vs the single-device oracle.

Same virtual-mesh strategy as the ring tests (SURVEY.md §4): real
``all_to_all`` collectives on an 8-virtual-device CPU backend.
"""

import jax
import jax.numpy as jnp
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
