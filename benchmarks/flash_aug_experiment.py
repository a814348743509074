#!/usr/bin/env python
"""Round-4 D=64 lever: fold the l-sum into the P.V matmul.

V is augmented with a ones column (host-side, lanes 64..127: [1, 0...]);
the P.V matmul then produces [PV | row-sums] in one MXU op — the VPU
loses the per-tile l reduction + EMA update, and at D=64 the extra MXU
width was idle anyway. l lives in the accumulator's lane 64; the single
lane-broadcast happens once per q block at the store.
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


def _aug_kernel(
    q_ref, k_ref, v_ref, o_ref, m_s, acc_s,
    *, sm_scale, bq, bkv, num_kv_blocks, d,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, -jnp.inf)
        acc_s[:] = jnp.zeros_like(acc_s)

    should = ki * bkv <= (qi + 1) * bq - 1

    @pl.when(should)
    def _run():
        q = q_ref[0, 0] * jnp.asarray(sm_scale, q_ref.dtype)
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + ki * bkv
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + qi * bq
        s = jnp.where(col <= row, s, MASK)
        m_prev = m_s[:]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        rep = bkv // NUM_LANES
        p = jnp.exp(s - (m_next if rep == 1 else jnp.tile(m_next, (1, rep))))
        alpha = jnp.exp(m_prev - m_next)
        m_s[:] = m_next
        v = v_ref[0, 0]  # (bkv, 128) augmented
        pv = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )  # (bq, 128): [PV | l | 0]
        acc_s[:] = acc_s[:] * alpha + pv

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        acc = acc_s[:]
        l_col = acc[:, d:d + 1]
        l_inv = jnp.where(l_col == 0.0, 1.0, 1.0 / l_col)  # (bq, 1)
        o_ref[0, 0] = (acc[:, :d] * l_inv).astype(o_ref.dtype)


def flash_aug(q, k, v, *, bq=512, bkv=512):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    # augment V: [v | 1 | 0...] to 128 lanes
    ones = jnp.ones(vt.shape[:-1] + (1,), vt.dtype)
    zeros = jnp.zeros(vt.shape[:-1] + (NUM_LANES - d - 1,), vt.dtype)
    v_aug = jnp.concatenate([vt, ones, zeros], axis=-1)
    scale = d ** -0.5
    nq = sq // bq
    nkv = skv // bkv

    def kv_map(b_, h_, qi, ki):
        return (
            b_, h_, jax.lax.select(ki * bkv <= (qi + 1) * bq - 1, ki, 0), 0,
        )

    o = pl.pallas_call(
        functools.partial(
            _aug_kernel, sm_scale=scale, bq=bq, bkv=bkv, num_kv_blocks=nkv,
            d=d,
        ),
        grid=(b, h, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
            pl.BlockSpec((1, 1, bkv, d), kv_map),
            pl.BlockSpec((1, 1, bkv, NUM_LANES), kv_map),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, NUM_LANES), jnp.float32),
            pltpu.VMEM((bq, NUM_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(qt, kt, v_aug)
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

    q = jnp.asarray(rng.standard_normal((1, 2048, 2, 64)), jnp.float32)
    ref, _ = attention_reference(q, q, q, causal=True)
    out = flash_aug(q, q, q, bq=512, bkv=512)
    err = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    print(f"parity rel_err={err:.2e}", flush=True)
    assert err < 3e-3

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
        print(f"B{B} S{S} baseline: {t0*1e3:.3f} ms {fl/t0/1e12:.1f} TFLOP/s", flush=True)
        for bq, bkv in [(512, 512), (512, 1024), (1024, 512)]:
            try:
                t = bench(
                    lambda q_, k_, v_, bq=bq, bkv=bkv: flash_aug(
                        q_, k_, v_, bq=bq, bkv=bkv
                    ), q, k, v,
                )
                print(
                    f"B{B} S{S} aug {bq}x{bkv}: {t*1e3:.3f} ms "
                    f"{fl/t/1e12:.1f} TFLOP/s", flush=True,
                )
            except Exception as e:
                print(f"aug {bq}x{bkv} FAILED {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
