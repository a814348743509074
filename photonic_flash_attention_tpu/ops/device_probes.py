"""Measured device-rate probes beyond HBM bandwidth (ops/hbm_bw.py).

The composite roofline (hardware/roofline.py, VERDICT r4 #3) needs the
chip's *measured* rate on each unit an attention kernel exercises:

* MXU matmul rate  — bench.py `_calibrate_matmul_tflops` (XLA) and the
  model ceilings (197 bf16 / 394 int8 TFLOP/s on v5e),
* HBM read rate    — ops/hbm_bw.py (~750 GB/s sustained, measured),
* **VPU exp rate** — THIS module. The round-4 fixed-max-softmax and
  Schraudolph experiments (docs/kernels.md) proved transcendental exp
  throughput — not the online-softmax recurrence — is the D=64 flash
  wall; this probe turns that inference into a number the roofline can
  use.

Reference pairing: the reference's energy/latency constants were
analytic guesses (reference core/hybrid_router.py:599-611); here every
roofline input is measured on the chip the bench runs on.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_utils import resolve_interpret

_TILE = (512, 512)  # fp32 tile: 1 MB, VPU-shaped (sublanes x lanes)


def _exp_kernel(x_ref, o_ref, buf, *, iters: int):
    """``iters`` back-to-back dependent exps over a full VMEM tile.

    ``exp(-x)`` keeps the value in (0, 1] so the chain never overflows;
    the dependency chain prevents elision, and a full (512, 512) tile
    keeps every VPU lane busy so the measured rate is throughput, not
    latency.
    """
    buf[:] = x_ref[:]

    def body(_, carry):
        buf[:] = jnp.exp(-buf[:])
        return carry

    jax.lax.fori_loop(0, iters, body, 0)
    o_ref[:] = buf[:8]


def exp_probe(x: jax.Array, iters: int = 256, interpret: Optional[bool] = None) -> jax.Array:
    """Run ``iters`` chained exps over ``x`` (a (512, 512) fp32 tile);
    returns an (8, 512) slice so callers can force completion cheaply.

    elements-per-call = x.size * iters; divide by measured time for the
    chip's exp throughput (elements/s).
    """
    rows, cols = x.shape
    return pl.pallas_call(
        functools.partial(_exp_kernel, iters=iters),
        grid=(1,),
        in_specs=[pl.BlockSpec((rows, cols), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((8, cols), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, cols), x.dtype),
        scratch_shapes=[pltpu.VMEM((rows, cols), x.dtype)],
        # Without this XLA CSE/hoists the pure call out of the timing
        # scan and the probe measures nothing (same lesson as
        # ops/hbm_bw.py note 1).
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=resolve_interpret(interpret),
    )(x)


def _softmax_kernel(x_ref, o_ref, buf, m_buf, l_buf, *, iters: int, masked: bool):
    """``iters`` repetitions of the flash kernel's per-tile VPU stream:
    causal-style mask select, running row-max, exp, row-sum, alpha
    rescale, and the P->bf16 cast. This is the op mix that actually
    bounds D=64 flash forward — exp alone is ~1.5 Telem/s on v5e
    (measured, :func:`exp_probe`) but the full stream is ~5-8 VPU ops
    per score element.
    """
    rows, cols = x_ref.shape
    buf[:] = x_ref[:]
    m_buf[:] = jnp.full_like(m_buf, -1e30)
    l_buf[:] = jnp.zeros_like(l_buf)

    rep = cols // 128

    def body(i, carry):
        s = buf[:]
        if masked:
            pos = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
            s = jnp.where(pos <= i + cols, s, -1e30)  # in-loop mask select
        # EXACT stat-update structure of ops/flash.py:344-369 — stats
        # lane-REPLICATED at (rows, 128); one lane-broadcast per block.
        m_prev = m_buf[:]  # (rows, 128) replicated
        l_prev = l_buf[:]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # (rows, 1)
        m_next = jnp.maximum(m_prev, m_curr)  # the one lane-broadcast
        m_wide = m_next if rep == 1 else jnp.tile(m_next, (1, rep))
        p = jnp.exp(s - m_wide)
        alpha = jnp.exp(m_prev - m_next)
        l_buf[:] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_buf[:] = m_next
        # P->bf16 cast feeds the PV matmul in the real kernel; fold its
        # cost in and keep the chain live through buf.
        buf[:] = p.astype(jnp.bfloat16).astype(jnp.float32)
        return carry

    jax.lax.fori_loop(0, iters, body, 0)
    o_ref[:] = buf[:8]


def softmax_block_probe(
    x: jax.Array, iters: int = 64, masked: bool = True,
    interpret: Optional[bool] = None
) -> jax.Array:
    """Run ``iters`` chained online-softmax block updates over ``x``
    ((rows, cols) fp32); returns an (8, cols) slice. score-elements per
    call = x.size * iters. ``masked=False`` drops the iota+select pair —
    the stream a non-causal unmasked tile actually runs."""
    rows, cols = x.shape
    return pl.pallas_call(
        functools.partial(_softmax_kernel, iters=iters, masked=masked),
        grid=(1,),
        in_specs=[pl.BlockSpec((rows, cols), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((8, cols), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, cols), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, cols), x.dtype),
            pltpu.VMEM((rows, 128), x.dtype),
            pltpu.VMEM((rows, 128), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=resolve_interpret(interpret),
    )(x)


def measure_softmax_rate(
    *, iters: int = 512, fit=(20, 220), masked: bool = True
) -> float:
    """Measured throughput of the flash-forward softmax VPU stream
    (score elements/s) — the composite roofline's VPU term."""
    import time

    # (128, 512): the kernel body's ~8 live fp32 temporaries must fit the
    # 16 MB scoped-VMEM limit (a 512-row tile OOMs at 32 MB).
    rows, cols = 128, 512
    x = jnp.linspace(0.1, 1.0, rows * cols, dtype=jnp.float32).reshape(rows, cols)

    @functools.partial(jax.jit, static_argnums=1)
    def many(x, n):
        def body(carry, _):
            x, acc = carry
            small = softmax_block_probe(x, iters=iters, masked=masked)
            return (x, acc + jnp.sum(small)), None

        (x, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), None, length=n)
        return acc

    def run(n):
        float(many(x, n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = fit
    t = (run(hi) - run(lo)) / (hi - lo)
    return rows * cols * iters / t


def measure_exp_rate(
    *, iters: int = 256, fit=(20, 220)
) -> float:
    """Measured VPU exp throughput (elements/s) via the repo's standard
    scan-chained linear-fit methodology (bench.py docstring): the fit
    window is sized so the differenced device time is tens of ms and the
    ~24 ms tunneled host round-trip cancels.
    """
    import time

    rows, cols = _TILE
    x = jnp.linspace(0.1, 1.0, rows * cols, dtype=jnp.float32).reshape(rows, cols)

    @functools.partial(jax.jit, static_argnums=1)
    def many(x, n):
        def body(carry, _):
            x, acc = carry
            small = exp_probe(x, iters=iters)
            return (x, acc + jnp.sum(small)), None

        (x, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), None, length=n)
        return acc

    def run(n):
        float(many(x, n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = fit
    t = (run(hi) - run(lo)) / (hi - lo)
    return rows * cols * iters / t


def measure_softmax_linear(*, fit=(30, 430)) -> dict:
    """Fit the per-tile softmax-stream cost model ``t_tile = a + b*elems``
    from two tile areas (round-5 sweep: the model holds within ~5% from
    16K to 196K elements; a ~ 170 ns fixed per block update, 1/b ~ 900+
    Gelem/s asymptotic stream rate on v5e).

    The ASYMPTOTIC rate (1/b) is the implementation-independent VPU term
    of the composite roofline; the (a, b) pair itself feeds the serial
    no-overlap model that explains the measured flash kernels (see
    docs/kernels.md round-5 section).
    """
    import time

    shapes = [(32, 512, 4096), (224, 896, 512)]
    pts = []
    for rows, cols, iters in shapes:
        x = jnp.linspace(0.1, 1.0, rows * cols, dtype=jnp.float32).reshape(
            rows, cols
        )

        @functools.partial(jax.jit, static_argnums=1)
        def many(x, n, _iters=iters):
            def body(carry, _):
                x, acc = carry
                small = softmax_block_probe(x, iters=_iters, masked=False)
                return (x, acc + jnp.sum(small)), None

            (x, acc), _ = jax.lax.scan(
                body, (x, jnp.float32(0)), None, length=n
            )
            return acc

        def run(n):
            float(many(x, n))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(many(x, n))
                best = min(best, time.perf_counter() - t0)
            return best

        lo, hi = fit
        t_call = (run(hi) - run(lo)) / (hi - lo)
        pts.append((rows * cols, t_call / iters))

    (e1, t1), (e2, t2) = pts
    b = (t2 - t1) / (e2 - e1)
    a = t1 - b * e1
    return {
        "fixed_s_per_tile": max(a, 0.0),
        "s_per_elem": max(b, 1e-15),
        "asymptotic_elems_per_s": 1.0 / max(b, 1e-15),
        "points": pts,
    }
