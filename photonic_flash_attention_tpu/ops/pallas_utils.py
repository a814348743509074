"""Shared helpers for Pallas TPU kernels."""

from __future__ import annotations

import functools
from typing import Optional

import jax

NUM_LANES = 128


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=1)
def default_backend() -> str:
    return jax.default_backend()


def resolve_interpret(interpret: Optional[bool]) -> bool:
    """Kernels run compiled on TPU, interpreted elsewhere (CPU tests).

    This is how the package "tests multi-device without a cluster": the
    test suite forces ``JAX_PLATFORMS=cpu`` with 8 virtual devices and all
    Pallas kernels transparently fall back to interpreter mode (the
    analogue of the reference's ``PHOTONIC_SIMULATION=1`` conftest switch,
    reference tests/conftest.py:11).
    """
    if interpret is not None:
        return interpret
    return default_backend() != "tpu"


def dropout_keep(seed, rows, cols, kv_stride: int, rate: float, bh=None):
    """Deterministic positional dropout mask — layout/block independent.

    A murmur3-style 32-bit finalizer over the GLOBAL (batch*heads + head,
    q_row, kv_col) position and a seed. Because the mask depends only on
    position, the forward kernel, the Pallas backward (which works in the
    transposed score domain), and the XLA blockwise backward (different
    block sizes) all regenerate byte-identical masks — no (Sq, Skv) mask
    tensor ever exists in HBM.

    ``bh`` (the flattened batch-head index) makes masks i.i.d. per
    (batch, head), matching the reference's nn.Dropout draw
    (reference core/flash_attention_3.py:174-175); omitting it would
    drop the same positions for every batch element and head.

    Args:
      seed: traced int32/uint32 scalar.
      rows/cols: int32 arrays (broadcastable) of global q/kv indices.
      kv_stride: static int, the true KV length (position linearizer).
      rate: static drop probability in [0, 1).
      bh: int32 scalar or array (broadcastable against rows/cols) with
        the flattened batch*num_heads + head index; None = 0.

    Returns a bool array: True = keep.
    """
    import jax.numpy as jnp

    x = (
        rows.astype(jnp.uint32) * jnp.uint32(kv_stride & 0xFFFFFFFF)
        + cols.astype(jnp.uint32)
    ) ^ seed.astype(jnp.uint32)
    if bh is not None:
        # Golden-ratio odd-constant spread keeps adjacent (b, h) streams
        # decorrelated before the finalizer mixes.
        x = x ^ (
            jnp.asarray(bh).astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        )
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return x >= thresh
