"""Pallas backward-kernel parity vs the blockwise-XLA backward.

The forward-grad oracle tests live in test_flash_kernel.py (they now run
through the Pallas backward by default); this file pins the two backward
implementations against each other directly, including the edge geometry
(cross-length causal, unaligned sequence padding, sliding window, GQA
group-repeat) where the kernels' masking logic differs most.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photonic_flash_attention_tpu.ops.flash import (
    _flash_bwd,
    flash_attention_with_lse,
)
from photonic_flash_attention_tpu.ops.flash_bwd import (
    flash_attention_bwd_pallas,
)
from photonic_flash_attention_tpu.ops.pallas_utils import round_up


def _setup(rng, b, sq, skv, h, d, causal, window=None):
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    o, lse = flash_attention_with_lse(q, k, v, causal=causal)
    qt, kt, vt, ot = (x.transpose(0, 2, 1, 3) for x in (q, k, v, o))
    do = jnp.asarray(rng.standard_normal(ot.shape), jnp.float32)
    return qt, kt, vt, ot, lse, do


def _xla_bwd(qt, kt, vt, ot, lse, do, *, causal, window=None, block_kv=256):
    skv = kt.shape[2]
    skv_p = round_up(skv, block_kv)
    pad = ((0, 0), (0, 0), (0, skv_p - skv), (0, 0))
    dq, dk, dv, _, _ = _flash_bwd(
        qt,
        jnp.pad(kt, pad),
        jnp.pad(vt, pad),
        ot,
        lse,
        do,
        sm_scale=qt.shape[-1] ** -0.5,
        causal=causal,
        q_true_len=qt.shape[2],
        kv_true_len=skv,
        block_kv=block_kv,
        window=window,
    )
    return dq, dk[:, :, :skv], dv[:, :, :skv]


@pytest.mark.parametrize(
    "b,sq,skv,h,d,causal",
    [
        (2, 256, 256, 4, 64, False),
        (2, 256, 256, 4, 64, True),
        (1, 200, 200, 2, 64, True),  # unaligned -> padded rows/cols
        (1, 256, 384, 2, 64, True),  # cross-length causal (kv_off > 0)
        (2, 128, 128, 2, 32, False),  # head-dim padding
    ],
)
def test_pallas_bwd_matches_xla_bwd(rng, b, sq, skv, h, d, causal):
    qt, kt, vt, ot, lse, do = _setup(rng, b, sq, skv, h, d, causal)
    if skv != sq:
        # recompute residuals for cross-length
        pass
    ref = _xla_bwd(qt, kt, vt, ot, lse, do, causal=causal)
    got = flash_attention_bwd_pallas(
        qt, kt, vt, ot, lse, do, sm_scale=d ** -0.5, causal=causal,
        block_q=128, block_kv=128, interpret=True,
    )
    for name, a, e in zip("qkv", got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name} mismatch",
        )


def test_pallas_bwd_window(rng):
    b, s, h, d = 1, 256, 2, 64
    win = (-63, 0, "inside")
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    from photonic_flash_attention_tpu.ops.flash import _flash_core_fwd_impl

    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    o, lse = _flash_core_fwd_impl(
        qt, kt, vt, d ** -0.5, True, 128, 128, True, window=win
    )
    do = jnp.asarray(rng.standard_normal(o.shape), jnp.float32)
    ref = _xla_bwd(qt, kt, vt, o, lse, do, causal=True, window=win)
    got = flash_attention_bwd_pallas(
        qt, kt, vt, o, lse, do, sm_scale=d ** -0.5, causal=True,
        block_q=128, block_kv=128, interpret=True, window=win,
    )
    for name, a, e in zip("qkv", got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name} mismatch",
        )


def test_fully_masked_rows_produce_finite_grads(rng):
    # Window far enough left that early rows attend to nothing: the fwd
    # stores lse = -inf there; the backward must emit zeros, not NaN.
    b, s, h, d = 1, 256, 2, 64
    win = (-200, -100, "inside")
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    from photonic_flash_attention_tpu.ops.flash import _flash_core_fwd_impl

    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    o, lse = _flash_core_fwd_impl(
        qt, kt, vt, d ** -0.5, False, 128, 128, True, window=win
    )
    # Fully-masked rows carry a mask-magnitude negative lse (-inf in the
    # merge convention, DEFAULT_MASK_VALUE-scale when stored by the
    # kernel); either way exp(s - lse) would overflow without the
    # valid-mask `where` in the backward.
    assert bool(jnp.any(lse < -1e30))
    do = jnp.ones_like(o)
    got = flash_attention_bwd_pallas(
        qt, kt, vt, o, lse, do, sm_scale=d ** -0.5, causal=False,
        block_q=128, block_kv=128, interpret=True, window=win,
    )
    for name, a in zip("qkv", got):
        assert bool(jnp.all(jnp.isfinite(a))), f"d{name} not finite"


@pytest.mark.parametrize("bq", [128, 256])
def test_pallas_bwd_dropout_matches_xla_bwd(rng, bq):
    """Attention-dropout masks regenerate identically in both backwards
    (positional hash — block-size independent)."""
    from photonic_flash_attention_tpu.ops.flash import _flash_core_fwd_impl

    b, s, h, d = 1, 256, 2, 64
    rate, seed = 0.25, 77
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    seed_arr = jnp.asarray([seed], jnp.int32)
    o, lse = _flash_core_fwd_impl(
        q, k, v, d ** -0.5, True, 128, 128, True,
        save_residuals=True, dropout_rate=rate, dropout_seed=seed_arr,
    )
    do = jnp.asarray(rng.standard_normal(o.shape), jnp.float32)
    ref = _flash_bwd(
        q, k, v, o, lse, do, sm_scale=d ** -0.5, causal=True,
        q_true_len=s, kv_true_len=s, block_kv=128,
        dropout_rate=rate, dropout_seed=seed_arr,
    )[:3]
    got = flash_attention_bwd_pallas(
        q, k, v, o, lse, do, sm_scale=d ** -0.5, causal=True,
        block_q=bq, block_kv=128, interpret=True,
        dropout_rate=rate, dropout_seed=seed_arr,
    )
    for name, a, e in zip("qkv", got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name} mismatch",
        )
