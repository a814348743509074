"""Measured-HBM-bandwidth calibration kernels.

Decode is memory-bound, so its honest roofline is the bandwidth THIS
chip actually achieves on a plain stream — not the datasheet number.
These kernels are the memory-rate analogue of bench.py's XLA-matmul
compute calibration.

Two hard-won methodology notes (both measured on v5e through the
tunneled runtime, round 4):

1. A pure-XLA elementwise loop cannot serve as the probe — XLA
   folds/elides chained trivial scan bodies (measured 0.000 ms for a
   256 MB stream). The probe must be an opaque kernel.
2. The source array must be a jit ARGUMENT. A large array captured as
   an HLO constant streams at roughly HALF bandwidth (356 vs 736 GB/s
   for the identical DMA kernel on v5e) — so every bandwidth-sensitive
   benchmark in this repo threads its big arrays through the jit
   boundary explicitly.

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

# Round-5 calibration (clean linear-fit methodology, differenced device
# time >= 50 ms so the ~24 ms tunneled host round-trip cancels): 2 MB
# chunks sustain ~750 GB/s and 4 MB chunks the same; the round-4 default
# of 2 MB measured 725-736 GB/s only because its fit window was too
# small. 4 MB (2 slots = 8 MB VMEM) stays under the 16 MB scoped-vmem
# limit and is the bench default.
_CHUNK_ROWS = 4096  # x 512 lanes x 2B = 4 MB per DMA


def _read_kernel(x_hbm, o_ref, buf, sems, *, num_chunks: int):
    """Stream the whole array HBM->VMEM with double-buffered DMA; the
    tiny output write defeats dead-code elimination."""

    def get(i, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * _CHUNK_ROWS, _CHUNK_ROWS), :],
            buf.at[slot],
            sems.at[slot],
        )

    get(0, 0).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < num_chunks)
        def _():
            get(i + 1, nxt).start()

        get(i, slot).wait()
        return 0

    jax.lax.fori_loop(0, num_chunks, body, 0)
    o_ref[:] = buf[0, :8]


def hbm_read_probe(x: jax.Array, interpret: Optional[bool] = None) -> jax.Array:
    """Read every byte of ``x`` ((rows, 512), rows % 4096 == 0); returns
    an (8, 512) slice so callers can force completion cheaply.

    Pass ``x`` as a jit argument (see module docstring note 2).
    """
    import functools

    rows, cols = x.shape
    num_chunks = rows // _CHUNK_ROWS
    return pl.pallas_call(
        functools.partial(_read_kernel, num_chunks=num_chunks),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, cols), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, cols), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, _CHUNK_ROWS, cols), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=resolve_interpret(interpret),
    )(x)


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def hbm_copy(x: jax.Array, interpret: Optional[bool] = None) -> jax.Array:
    """Tiled identity copy (read+write stream); rows must divide by the
    2 MB tile height. Reads N + writes N bytes."""
    rows, cols = x.shape
    block = min(_CHUNK_ROWS, rows)
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
