"""Round-5 experiment: unrolled-KV/Q backward kernels.

The forward unroll (ops/flash_unrolled.py) proved the grid kernels are
per-tile VPU<->MXU serial; the backward kernels (ops/flash_bwd.py) have
the same structure with MORE matmuls per tile (3 for dq, 4 for dkv), so
the serial overhead share is smaller but still real. This experiment
unrolls the inner grid dimension of both kernels into straight-line
bodies with static triangular extents:

  * dq: one call per q block qi, kv extent = qi+1 tiles (K/V resident),
  * dkv: one call per kv block ki, q extent = blocks [ki, n_q)
    (Q/dO/lse/di resident; the body loops a static suffix).

Parity vs flash_attention_bwd_pallas; perf on the training geometries.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
sys.path.insert(0, "/root/repo")

from photonic_flash_attention_tpu.ops.flash import flash_attention_with_lse  # noqa: E402
from photonic_flash_attention_tpu.ops.flash_bwd import (  # noqa: E402
    flash_attention_bwd_pallas,
)

NEG_INF = -1e30


# -- dq: per q block, kv extent static --------------------------------------


def _dq_kernel_unrolled(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref,
                        *, block_kv: int, sm_scale: float, causal: bool,
                        q_row0: int):
    bq, d = q_ref.shape[2], q_ref.shape[3]
    n_kv = k_ref.shape[2] // block_kv
    q = q_ref[0, 0].astype(jnp.bfloat16)
    do = do_ref[0, 0].astype(jnp.bfloat16)
    lse_row = lse_ref[0, 0]  # (1, bq)
    di_row = di_ref[0, 0]
    dq = jnp.zeros((bq, d), jnp.float32)
    for j in range(n_kv):
        k = k_ref[0, 0, pl.ds(j * block_kv, block_kv), :].astype(jnp.bfloat16)
        v = v_ref[0, 0, pl.ds(j * block_kv, block_kv), :].astype(jnp.bfloat16)
        s_t = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        logits = s_t * sm_scale - lse_row
        if causal and (j + 1) * block_kv > q_row0:
            col_kv = (
                jax.lax.broadcasted_iota(jnp.int32, (block_kv, bq), 0)
                + j * block_kv
            )
            row_q = (
                jax.lax.broadcasted_iota(jnp.int32, (block_kv, bq), 1) + q_row0
            )
            p_t = jnp.where(col_kv <= row_q, jnp.exp(logits), 0.0)
        else:
            p_t = jnp.exp(logits)
        dp_t = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds_t = p_t * (dp_t - di_row) * sm_scale
        dq = dq + jax.lax.dot_general(
            ds_t.astype(jnp.bfloat16), k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


# -- dkv: per kv block, q suffix static --------------------------------------


def _dkv_kernel_unrolled(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                         dk_ref, dv_ref, *, block_q: int, sm_scale: float,
                         causal: bool, kv_col0: int, q_block0: int):
    bkv, d = k_ref.shape[2], k_ref.shape[3]
    n_q = q_ref.shape[2] // block_q
    k = k_ref[0, 0].astype(jnp.bfloat16)
    v = v_ref[0, 0].astype(jnp.bfloat16)
    dk = jnp.zeros((bkv, d), jnp.float32)
    dv = jnp.zeros((bkv, d), jnp.float32)
    for j in range(q_block0, n_q):
        rows = pl.ds(j * block_q, block_q)
        q = q_ref[0, 0, rows, :].astype(jnp.bfloat16)
        do = do_ref[0, 0, rows, :].astype(jnp.bfloat16)
        lse_row = lse_ref[0, 0, :, pl.ds(j * block_q, block_q)]
        di_row = di_ref[0, 0, :, pl.ds(j * block_q, block_q)]
        s_t = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        logits = s_t * sm_scale - lse_row
        if causal and kv_col0 + bkv > j * block_q:
            col_kv = (
                jax.lax.broadcasted_iota(jnp.int32, (bkv, block_q), 0)
                + kv_col0
            )
            row_q = (
                jax.lax.broadcasted_iota(jnp.int32, (bkv, block_q), 1)
                + j * block_q
            )
            p_t = jnp.where(col_kv <= row_q, jnp.exp(logits), 0.0)
        else:
            p_t = jnp.exp(logits)
        dp_t = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds_t = p_t * (dp_t - di_row) * sm_scale
        dv = dv + jax.lax.dot(
            p_t.astype(jnp.bfloat16), do, preferred_element_type=jnp.float32
        )
        dk = dk + jax.lax.dot(
            ds_t.astype(jnp.bfloat16), q, preferred_element_type=jnp.float32
        )
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def flash_bwd_unrolled(q, k, v, o, lse, do, *, sm_scale, causal,
                       block_q=512, block_kv=512):
    """[B, H, S, D] domain, like flash_attention_bwd_pallas."""
    b, h, s, d = q.shape
    n_q = s // block_q
    n_kv = s // block_kv
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    lse4 = lse.astype(jnp.float32)[:, :, None, :]
    di4 = di[:, :, None, :]

    # dq: one call per q block
    dqs = []
    for i in range(n_q):
        kv_tiles = (
            min((i * block_q + block_q + block_kv - 1) // block_kv, n_kv)
            if causal else n_kv
        )
        span = kv_tiles * block_kv
        kern = functools.partial(
            _dq_kernel_unrolled, block_kv=block_kv, sm_scale=sm_scale,
            causal=causal, q_row0=i * block_q,
        )
        dq_i = pl.pallas_call(
            kern,
            grid=(b, h),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i=i: (b_, h_, i, 0)),
                pl.BlockSpec((1, 1, span, d), lambda b_, h_: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, span, d), lambda b_, h_: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i=i: (b_, h_, i, 0)),
                pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, i=i: (b_, h_, 0, i)),
                pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, i=i: (b_, h_, 0, i)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b_, h_: (b_, h_, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h, block_q, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(q, k, v, do, lse4, di4)
        dqs.append(dq_i)
    dq = jnp.concatenate(dqs, axis=2) if len(dqs) > 1 else dqs[0]

    # dkv: one call per kv block; q/do/lse/di fully resident, static suffix
    dks, dvs = [], []
    for ki in range(n_kv):
        q_block0 = (ki * block_kv) // block_q if causal else 0
        kern = functools.partial(
            _dkv_kernel_unrolled, block_q=block_q, sm_scale=sm_scale,
            causal=causal, kv_col0=ki * block_kv, q_block0=q_block0,
        )
        dk_i, dv_i = pl.pallas_call(
            kern,
            grid=(b, h),
            in_specs=[
                pl.BlockSpec((1, 1, s, d), lambda b_, h_: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_, ki=ki: (b_, h_, ki, 0)),
                pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_, ki=ki: (b_, h_, ki, 0)),
                pl.BlockSpec((1, 1, s, d), lambda b_, h_: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, 1, s), lambda b_, h_: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, 1, s), lambda b_, h_: (b_, h_, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_: (b_, h_, 0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, h, block_kv, d), k.dtype),
                jax.ShapeDtypeStruct((b, h, block_kv, d), v.dtype),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(q, k, v, do, lse4, di4)
        dks.append(dk_i)
        dvs.append(dv_i)
    dk = jnp.concatenate(dks, axis=2) if len(dks) > 1 else dks[0]
    dv = jnp.concatenate(dvs, axis=2) if len(dvs) > 1 else dvs[0]
    return dq, dk, dv


def _prep(rng, b, s, h, d, causal):
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    o, lse = flash_attention_with_lse(q, k, v, causal=causal)
    do = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    # [B, H, S, D] domain
    t = lambda x: x.transpose(0, 2, 1, 3)  # noqa: E731
    return t(q), t(k), t(v), t(o.astype(jnp.bfloat16)), lse, t(do)


def _bench_bwd(fn, args, iters):
    @functools.partial(jax.jit, static_argnums=1)
    def many(args, n):
        q, k, v, o, lse, do = args

        def body(c, _):
            dq, dk, dv = fn(c, k, v, o, lse, do)
            return (c + dq.astype(c.dtype) * jnp.bfloat16(1e-6)).astype(c.dtype), None

        qq, _ = jax.lax.scan(body, q, None, length=n)
        return jnp.sum(qq.astype(jnp.float32))

    def run(n):
        float(many(args, n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = iters
    return (run(hi) - run(lo)) / (hi - lo)


def main():
    rng = np.random.default_rng(0)
    print("== parity ==", flush=True)
    for causal in (False, True):
        q, k, v, o, lse, do = _prep(rng, 1, 1024, 2, 64, causal)
        sm = 64 ** -0.5
        dq0, dk0, dv0 = flash_attention_bwd_pallas(
            q, k, v, o, lse, do, sm_scale=sm, causal=causal
        )
        dq1, dk1, dv1 = flash_bwd_unrolled(
            q, k, v, o, lse, do, sm_scale=sm, causal=causal,
            block_q=256, block_kv=256,
        )
        for name, a, bb in (("dq", dq0, dq1), ("dk", dk0, dk1), ("dv", dv0, dv1)):
            rel = float(
                jnp.max(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32)))
                / (jnp.max(jnp.abs(a.astype(jnp.float32))) + 1e-9)
            )
            print(f"causal={causal} {name}: rel {rel:.2e}", flush=True)
            assert rel < 3e-2, (name, rel)

    print("== perf ==", flush=True)
    for name, (b_, s_, h_, d_), causal in [
        ("d64 b4 s2048 causal", (4, 2048, 12, 64), True),
        ("d64 b1 s8192 causal", (1, 8192, 12, 64), True),
        ("d128 b4 s4096 causal", (4, 4096, 8, 128), True),
    ]:
        args = _prep(rng, b_, s_, h_, d_, causal)
        fl = 4 * b_ * h_ * s_ * s_ * d_ * (0.5 if causal else 1.0) * 2.5
        est_ms = fl / 50e12 * 1e3
        hi = max(20, int(50.0 / est_ms))
        it = (hi // 10, hi)
        sm = d_ ** -0.5
        t_ref = _bench_bwd(
            lambda q, k, v, o, lse, do: flash_attention_bwd_pallas(
                q, k, v, o, lse, do, sm_scale=sm, causal=causal
            ),
            args, it,
        )
        for bqq, bkk in [(512, 512), (256, 512), (512, 256)]:
            try:
                t = _bench_bwd(
                    lambda q, k, v, o, lse, do: flash_bwd_unrolled(
                        q, k, v, o, lse, do, sm_scale=sm, causal=causal,
                        block_q=bqq, block_kv=bkk,
                    ),
                    args, it,
                )
                print(
                    f"{name} unrolled bq={bqq} bkv={bkk}: {t*1e3:.3f} ms "
                    f"vs grid {t_ref*1e3:.3f} ms -> {t_ref/t:.2f}x",
                    flush=True,
                )
            except Exception as e:
                print(f"{name} bq={bqq} bkv={bkk}: FAIL {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
