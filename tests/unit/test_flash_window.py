"""Sliding-window (local) attention vs a masked dense oracle.

New capability beyond the reference (which has no local-attention path;
its long-context story is the tiled kernel alone, reference
core/flash_attention_3.py:182-262). The window runs on a diagonal-band
grid, so cost scales with S*window rather than S^2.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photonic_flash_attention_tpu.ops.flash import flash_attention
from photonic_flash_attention_tpu.ops.reference import attention_reference

from ..conftest import assert_close


def _mk(b=2, s=512, h=4, d=64, skv=None, seed=0):
    rng = np.random.default_rng(seed)
    skv = skv or s
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    return q, k, v


def _window_mask(sq, skv, lo, hi):
    off = skv - sq
    row = jnp.arange(sq)[:, None] + off
    col = jnp.arange(skv)[None, :]
    rel = col - row
    m = jnp.ones((sq, skv), bool)
    if lo is not None:
        m = m & (rel >= lo)
    if hi is not None:
        m = m & (rel <= hi)
    return m[None, None]


class TestSlidingWindow:
    @pytest.mark.parametrize("w", [128, 256])
    def test_causal_local_matches_oracle(self, w):
        q, k, v = _mk()
        mask = _window_mask(512, 512, -w + 1, 0)
        ref, _ = attention_reference(q, k, v, mask=mask, causal=True)
        out = flash_attention(
            q, k, v, causal=True, window=(-w + 1, 0), block_q=128, block_kv=128
        )
        assert_close(out, ref, atol=2e-5, rtol=2e-5)

    def test_bidirectional_band(self):
        q, k, v = _mk()
        ref, _ = attention_reference(q, k, v, mask=_window_mask(512, 512, -64, 64))
        out = flash_attention(
            q, k, v, window=(-64, 64), block_q=128, block_kv=128
        )
        assert_close(out, ref, atol=2e-5, rtol=2e-5)

    def test_one_sided_window(self):
        # Only a lower bound: "attend to at most the last w keys" without
        # a causal flag is ill-posed, so pair lo with causal.
        q, k, v = _mk(s=256)
        ref, _ = attention_reference(
            q, k, v, mask=_window_mask(256, 256, -100, None), causal=True
        )
        out = flash_attention(
            q, k, v, causal=True, window=(-100, None), block_q=128, block_kv=128
        )
        assert_close(out, ref, atol=2e-5, rtol=2e-5)

    def test_cross_attention_decode_alignment(self):
        q, k, v = _mk(s=128, skv=384)
        mask = _window_mask(128, 384, -127, 0)
        ref, _ = attention_reference(q, k, v, mask=mask, causal=True)
        out = flash_attention(
            q, k, v, causal=True, window=(-127, 0), block_q=128, block_kv=128
        )
        assert_close(out, ref, atol=2e-5, rtol=2e-5)

    def test_grads_match_masked_oracle(self):
        q, k, v = _mk(b=1, s=256, h=2)
        mask = _window_mask(256, 256, -63, 0)

        def loss_flash(q, k, v):
            out = flash_attention(
                q, k, v, causal=True, window=(-63, 0), block_q=128, block_kv=128
            )
            return jnp.sum(out ** 2)

        def loss_dense(q, k, v):
            out, _ = attention_reference(q, k, v, mask=mask, causal=True)
            return jnp.sum(out ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gd):
            assert_close(a, b, atol=5e-4, rtol=5e-4)

    def test_window_with_rel_bias_rejected(self):
        q, k, v = _mk(s=128)
        from photonic_flash_attention_tpu.ops.rel_bias import ALiBi, alibi_slopes

        with pytest.raises(ValueError, match="window"):
            flash_attention(
                q, k, v, rel_bias=ALiBi(slopes=alibi_slopes(4)), window=(-8, 0)
            )
