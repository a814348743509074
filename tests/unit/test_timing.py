"""Honest kernel timing (core/timing.py) — the router's measurement source."""

import jax
import jax.numpy as jnp
import numpy as np

from photonic_flash_attention_tpu.core.timing import default_iters, measure_ms


class TestMeasureMs:
    def test_positive_and_finite(self, rng):
        x = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
        ms = measure_ms(lambda c: c @ x, x)
        assert np.isfinite(ms) and ms > 0

    def test_chains_preserve_shape_dtype(self, rng):
        x = jnp.asarray(rng.standard_normal((32, 32)), jnp.bfloat16)
        # step returns fp32; measure_ms must cast back for the chain.
        ms = measure_ms(lambda c: (c @ x).astype(jnp.float32), x)
        assert ms > 0

    def test_slope_scales_with_work(self, rng):
        """A ~100x heavier step must measure meaningfully slower."""
        small = jnp.asarray(rng.standard_normal((16, 16)), jnp.float32)
        big = jnp.asarray(rng.standard_normal((512, 512)), jnp.float32)
        ms_small = measure_ms(
            lambda c: c @ small, small, iters=(2, 20), repeats=2
        )
        ms_big = measure_ms(lambda c: c @ big, big, iters=(2, 20), repeats=2)
        assert ms_big > ms_small

    def test_default_iters_backend_aware(self):
        lo, hi, rep = default_iters()
        assert lo < hi and rep >= 1
