"""Fused nonlinearity kernels vs jnp oracles.

Covers the reference's nonlinearity surface (reference
photonic/optical_kernels/nonlinearity.py): softmax stability at extreme
inputs, layer norm, rms norm, dispatcher, and differentiability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photonic_flash_attention_tpu.ops.nonlinearity import (
    NonlinearityType,
    apply_nonlinearity,
    fused_layer_norm,
    fused_rms_norm,
    fused_softmax,
)

from ..conftest import assert_close


@pytest.mark.parametrize("shape", [(4, 128), (2, 8, 200), (3, 7, 5, 64)])
@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16], ids=["f32", "bf16"])
def test_softmax_matches_oracle(shape, dt):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape) * 3, dt)
    got = fused_softmax(x)
    want = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
    assert_close(got, want)
    # Rows sum to ~1 — the reference's normalization gate
    # (reference photonic_attention.py:283-285, atol 1e-3).
    sums = np.asarray(jnp.sum(got.astype(jnp.float32), axis=-1))
    atol = 2e-3 if dt == jnp.float32 else 4e-2  # bf16: ~2^-9/element rounding
    np.testing.assert_allclose(sums, np.ones_like(sums), atol=atol)


def test_softmax_extreme_inputs_stable():
    # +-10 sigma stability, mirroring the reference's stability test
    # (reference tests/unit/test_flash_attention_3.py:249-262).
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 256)) * 100.0, jnp.float32)
    got = np.asarray(fused_softmax(x))
    assert np.all(np.isfinite(got))
    want = np.asarray(jax.nn.softmax(x, axis=-1))
    assert_close(got, want)


def test_softmax_nonlast_axis():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 96, 6)), jnp.float32)
    got = fused_softmax(x, axis=1)
    want = jax.nn.softmax(x, axis=1)
    assert_close(got, want)


@pytest.mark.parametrize("d", [128, 200, 768])
@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16], ids=["f32", "bf16"])
def test_layer_norm_matches_oracle(d, dt):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((6, 5, d)) * 2 + 1, dt)
    g = jnp.asarray(rng.standard_normal(d) * 0.1 + 1, dt)
    b = jnp.asarray(rng.standard_normal(d) * 0.1, dt)
    got = fused_layer_norm(x, g, b)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    want = (xf - mu) / jnp.sqrt(var + 1e-5) * g.astype(jnp.float32) + b.astype(
        jnp.float32
    )
    assert_close(got, want)


@pytest.mark.parametrize("d", [128, 512])
def test_rms_norm_matches_oracle(d):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 9, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(d) * 0.1 + 1, jnp.float32)
    got = fused_rms_norm(x, g)
    ms = jnp.mean(jnp.square(x), -1, keepdims=True)
    want = x / jnp.sqrt(ms + 1e-6) * g
    assert_close(got, want)


def test_layer_norm_grad_matches_oracle():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(256) * 0.1 + 1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(256) * 0.1, jnp.float32)

    def loss_fused(x, g, b):
        return jnp.sum(jnp.square(fused_layer_norm(x, g, b)))

    def loss_ref(x, g, b):
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.var(x, -1, keepdims=True)
        y = (x - mu) / jnp.sqrt(var + 1e-5) * g + b
        return jnp.sum(jnp.square(y))

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, g, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
    for a, w in zip(got, want):
        assert_close(a, w)


def test_rms_norm_grad_matches_oracle():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((3, 128)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(128) * 0.1 + 1, jnp.float32)

    def loss_fused(x, g):
        return jnp.sum(jnp.square(fused_rms_norm(x, g)))

    def loss_ref(x, g):
        ms = jnp.mean(jnp.square(x), -1, keepdims=True)
        return jnp.sum(jnp.square(x / jnp.sqrt(ms + 1e-6) * g))

    got = jax.grad(loss_fused, argnums=(0, 1))(x, g)
    want = jax.grad(loss_ref, argnums=(0, 1))(x, g)
    for a, w in zip(got, want):
        assert_close(a, w)


def test_dispatcher_all_kinds():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)
    for kind in NonlinearityType:
        out = apply_nonlinearity(kind, x)
        assert out.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out)))
    # String aliases, as the reference dispatcher accepts.
    assert_close(apply_nonlinearity("softmax", x), jax.nn.softmax(x, -1))
    assert_close(apply_nonlinearity("gelu", x), jax.nn.gelu(x))


def test_dispatcher_rejects_unknown():
    with pytest.raises(ValueError):
        apply_nonlinearity("tanh-ish", jnp.zeros((2, 128)))
