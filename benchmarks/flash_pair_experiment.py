#!/usr/bin/env python
"""Round-4 D=64 headline experiment: two q-blocks per grid step.

Hypothesis (VERDICT r3 #4): the D=64 kernel is VPU-bound (exp dominates)
with a serial s->exp->pv chain per tile. Pairing two q blocks against
the SAME K/V tile gives two independent dataflow chains in one kernel
body — Mosaic's scheduler can overlap chain A's exp (VPU) with chain
B's matmuls (MXU) — at zero extra DMA traffic.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_LANES = 128
MASK = -0.7 * float(np.finfo(np.float32).max)


def _pair_kernel(
    q_ref,  # (1, 1, n*bq, d)
    k_ref,  # (1, 1, bkv, d)
    v_ref,
    o_ref,  # (1, 1, n*bq, d)
    m_s,  # (n*bq, 128)
    l_s,
    acc_s,  # (n*bq, d)
    *,
    sm_scale: float,
    bq: int,
    bkv: int,
    num_kv_blocks: int,
    nchain: int = 2,
):
    qp = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, -jnp.inf)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    rep = bkv // NUM_LANES

    def chain(i):
        qi = qp * nchain + i
        should = ki * bkv <= (qi + 1) * bq - 1

        @pl.when(should)
        def _run():
            rows = pl.ds(i * bq, bq)
            q = q_ref[0, 0, rows] * jnp.asarray(sm_scale, q_ref.dtype)
            k = k_ref[0, 0]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + ki * bkv
            row = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + qi * bq
            s = jnp.where(col <= row, s, MASK)
            m_prev = m_s[rows]
            l_prev = l_s[rows]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            p = jnp.exp(s - (m_next if rep == 1 else jnp.tile(m_next, (1, rep))))
            alpha = jnp.exp(m_prev - m_next)
            l_s[rows] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_s[rows] = m_next
            v = v_ref[0, 0]
            pv = jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            d_ = acc_s.shape[-1]
            alpha_d = alpha[:, :d_] if d_ <= NUM_LANES else jnp.tile(
                alpha, (1, d_ // NUM_LANES)
            )
            acc_s[rows] = acc_s[rows] * alpha_d + pv

    for _i in range(nchain):
        chain(_i)

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        l_fin = l_s[:]
        l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
        d_ = acc_s.shape[-1]
        l_inv_d = l_inv[:, :d_] if d_ <= NUM_LANES else jnp.tile(
            l_inv, (1, d_ // NUM_LANES)
        )
        o_ref[0, 0] = (acc_s[:] * l_inv_d).astype(o_ref.dtype)


def flash_pair(q, k, v, *, bq=512, bkv=512, nchain=2):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    scale = d ** -0.5
    nqp = sq // (nchain * bq)
    nkv = skv // bkv

    def kv_map(b_, h_, qp, ki):
        # causal skip-aware prefetch (redirect dead blocks to 0)
        return (
            b_, h_,
            jax.lax.select(ki * bkv <= (qp * nchain + nchain) * bq - 1, ki, 0),
            0,
        )

    o = pl.pallas_call(
        functools.partial(
            _pair_kernel, sm_scale=scale, bq=bq, bkv=bkv, num_kv_blocks=nkv,
            nchain=nchain,
        ),
        grid=(b, h, nqp, nkv),
        in_specs=[
            pl.BlockSpec((1, 1, nchain * bq, d), lambda b_, h_, qp, ki: (b_, h_, qp, 0)),
            pl.BlockSpec((1, 1, bkv, d), kv_map),
            pl.BlockSpec((1, 1, bkv, d), kv_map),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, nchain * bq, d), lambda b_, h_, qp, ki: (b_, h_, qp, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((nchain * bq, NUM_LANES), jnp.float32),
            pltpu.VMEM((nchain * bq, NUM_LANES), jnp.float32),
            pltpu.VMEM((nchain * bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(qt, kt, vt)
    return o.transpose(0, 2, 1, 3)


def _timed(fn, q, k, v, iters, repeats=3):
    @functools.partial(jax.jit, static_argnums=3)
    def many(q, k, v, n):
        def body(c, _):
            return fn(c, k, v).astype(c.dtype), None

        out, _ = jax.lax.scan(body, q, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    float(many(q, k, v, iters))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(many(q, k, v, iters))
        best = min(best, time.perf_counter() - t0)
    return best


def bench(fn, q, k, v, lo=20, hi=120):
    return (_timed(fn, q, k, v, hi) - _timed(fn, q, k, v, lo)) / (hi - lo)


def main():
    from photonic_flash_attention_tpu.optimization.caching import (
        CompileCacheManager,
    )
    from photonic_flash_attention_tpu.ops.flash import flash_attention
    from photonic_flash_attention_tpu.ops.reference import attention_reference

    try:
        CompileCacheManager().enable()
    except Exception:
        pass
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # correctness first (tiny, CPU-interpretable on TPU too)
    q = jnp.asarray(rng.standard_normal((1, 2048, 2, 64)), jnp.float32)
    ref, _ = attention_reference(q, q, q, causal=True)
    out = flash_pair(q, q, q, bq=512, bkv=512)
    err = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    print(f"parity rel_err={err:.2e}", flush=True)
    assert err < 3e-3  # TPU f32 matmuls use bf16 passes at default precision

    for (B, S, H, D) in [(4, 2048, 12, 64), (1, 8192, 12, 64)]:
        q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
        fl = 4 * B * H * S * S * D * 0.5
        t0 = bench(
            lambda q_, k_, v_: flash_attention(
                q_, k_, v_, causal=True, block_q=512, block_kv=512
            ), q, k, v,
        )
        print(f"B{B} S{S} baseline 512x512: {t0*1e3:.3f} ms {fl/t0/1e12:.1f} TFLOP/s", flush=True)
        for bq, bkv, nc in [(512, 512, 2), (512, 512, 4), (256, 512, 4),
                            (256, 256, 4), (512, 512, 3)]:
            try:
                t = bench(
                    lambda q_, k_, v_, bq=bq, bkv=bkv, nc=nc: flash_pair(
                        q_, k_, v_, bq=bq, bkv=bkv, nchain=nc
                    ), q, k, v,
                )
                print(
                    f"B{B} S{S} pair {bq}x{bkv} x{nc}: {t*1e3:.3f} ms "
                    f"{fl/t/1e12:.1f} TFLOP/s", flush=True,
                )
            except Exception as e:
                print(f"pair {bq}x{bkv} x{nc} FAILED {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
