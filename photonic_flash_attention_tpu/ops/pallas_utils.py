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
