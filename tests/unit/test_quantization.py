"""Quantization round-trip and error-budget gates.

The rebirth of the reference's calibration accuracy checks (reference
cli.py:239-303: random patterns through the quantized path, accuracy =
1 - mean relative error).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from photonic_flash_attention_tpu.ops.quantization import (
    QuantizedTensor,
    quantization_error,
    quantize,
    quantize_kv,
)


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float8_e4m3fn], ids=["int8", "fp8"])
class TestRoundTrip:
    def test_shapes(self, rng, dtype):
        x = jnp.asarray(rng.standard_normal((4, 256, 64)), jnp.float32)
        qt = quantize(x, dtype, axis=1, block_size=128)
        assert qt.values.shape == x.shape
        assert qt.values.dtype == dtype
        assert qt.scales.shape == (4, 2, 64)
        assert qt.dequantize().shape == x.shape

    def test_round_trip_error(self, rng, dtype):
        x = jnp.asarray(rng.standard_normal((2, 512, 32)), jnp.float32)
        qt = quantize(x, dtype, axis=1, block_size=128)
        err = quantization_error(x, qt)
        # int8/fp8 with per-block scales: well under the reference's 10% gate.
        assert err["mean_rel_err"] < 0.05
        assert err["accuracy"] > 0.95

    def test_unaligned_block(self, rng, dtype):
        x = jnp.asarray(rng.standard_normal((1, 200, 16)), jnp.float32)
        qt = quantize(x, dtype, axis=1, block_size=128)
        assert qt.dequantize().shape == x.shape
        err = quantization_error(x, qt)
        assert err["mean_rel_err"] < 0.05

    def test_outlier_isolation(self, rng, dtype):
        """Per-block scales contain an outlier's damage to its own block."""
        x = np.asarray(rng.standard_normal((1, 512, 16)), np.float32)
        x[0, 5, 3] = 1000.0
        qt = quantize(jnp.asarray(x), dtype, axis=1, block_size=128)
        xr = np.asarray(qt.dequantize())
        clean = np.abs(xr[0, 256:] - x[0, 256:])
        # Blocks without the outlier keep their native precision: int8 has
        # ~0.8% steps, fp8-e4m3 ~6% relative steps (3 mantissa bits).
        limit = 0.1 if dtype == jnp.int8 else 0.3
        assert clean.max() < limit

    def test_zeros_stable(self, dtype, rng):
        x = jnp.zeros((1, 128, 8), jnp.float32)
        qt = quantize(x, dtype, axis=1)
        assert bool(jnp.all(qt.dequantize() == 0.0))
        assert bool(jnp.all(jnp.isfinite(qt.scales)))


def test_quantize_kv_pair(rng):
    k = jnp.asarray(rng.standard_normal((2, 256, 4, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 256, 4, 64)), jnp.float32)
    kq, vq = quantize_kv(k, v, jnp.int8, seq_axis=1, block_size=128)
    assert kq.values.dtype == jnp.int8
    assert quantization_error(k, kq)["mean_rel_err"] < 0.05
    assert quantization_error(v, vq)["mean_rel_err"] < 0.05


def test_pytree_flatten(rng):
    import jax

    x = jnp.asarray(rng.standard_normal((1, 128, 8)), jnp.float32)
    qt = quantize(x, jnp.int8, axis=1)
    leaves, treedef = jax.tree_util.tree_flatten(qt)
    qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert bool(jnp.all(qt2.dequantize() == qt.dequantize()))
