"""Measured-HBM-bandwidth calibration kernel.

A trivial Pallas grid copy (HBM -> VMEM -> HBM) used as the memory-rate
analogue of bench.py's XLA-matmul compute calibration: decode is
memory-bound, so its honest roofline is the bandwidth THIS chip actually
achieves on a plain stream, not the datasheet number. A pure-XLA
elementwise loop cannot serve here — XLA folds/elides chained trivial
scan bodies (measured 0.000 ms for a 256 MB stream on v5e) — while an
opaque kernel is always executed.

Reference pairing: the reference models bandwidth analytically in its
interconnect simulator (photonic/optical_kernels/interconnect.py); here
the number is measured on the device the bench runs on.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_utils import resolve_interpret

_BLOCK_ROWS = 2048  # x 512 lanes x 2B = 2 MB per tile


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def hbm_copy(x: jax.Array, interpret: Optional[bool] = None) -> jax.Array:
    """Tiled identity copy; rows must divide by the 2 MB tile height."""
    rows, cols = x.shape
    block = min(_BLOCK_ROWS, rows)
    return pl.pallas_call(
        _copy_kernel,
        grid=(rows // block,),
        in_specs=[
            pl.BlockSpec((block, cols), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block, cols), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=resolve_interpret(interpret),
    )(x)
