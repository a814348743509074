"""Fused short-sequence attention path.

The rebirth of the reference's ``_standard_attention`` small-tensor branch
(reference core/flash_attention_3.py:152-180): below the router crossover
the whole (Sq, Skv) score tile fits comfortably on-chip, and XLA's fusion
of einsum+softmax+einsum is already speed-of-light — a hand-written kernel
adds nothing. This path also carries features the tiled kernel does not
(arbitrary boolean masks, returned attention weights), mirroring how the
reference's standard path served `need_weights=True`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from .reference import attention_reference


def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    bias: Optional[jax.Array] = None,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    need_weights: bool = False,
    weights_only: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """XLA-fused O(S^2) attention; best below the flash crossover."""
    return attention_reference(
        q,
        k,
        v,
        mask,
        bias=bias,
        causal=causal,
        sm_scale=sm_scale,
        need_weights=need_weights,
        weights_only=weights_only,
    )
