"""Round-5 experiment: VPU<->MXU overlap via an in-body unrolled KV loop.

MOTIVATION (the round-5 composite-roofline finding): the measured flash
kernels sit almost exactly at the SERIAL sum of their per-tile unit
times — t_tile = t_vpu(softmax stream) + t_mxu(QK + PV):

  * D=64 bf16 causal b4 s2048 (512x512): 480 tiles x (440+681) ns
    = 538 us model vs 509 us measured,
  * D=128 int8qk NON-causal b4 s4096 (1024x512): 4096 tiles x
    (713+1022) ns = 7.11 ms model vs 7.17 ms measured.

The grid-loop kernel (ops/flash.py) runs one kv tile per grid step;
Mosaic schedules each body serially, so the VPU sits idle during the
matmuls and vice versa. The TPU's VLIW bundles CAN dual-issue vector
and matrix ops — the ceiling with perfect overlap is
max(t_vpu, t_mxu), up to 1.7x today's rate.

EXPERIMENT: restructure so consecutive kv tiles live in ONE straight-
line body (grid = (b, h, q_blocks); K/V rows resident in VMEM; a Python
-unrolled loop over kv tiles using pure SSA values for the online-
softmax state instead of scratch refs). QK(i+1) depends only on q and
k(i+1) — the scheduler is free to interleave it with softmax(i).

Judged against ops/flash.py at identical shapes. See
docs/kernels.md "Round 5" for the outcome.
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

from photonic_flash_attention_tpu.ops.flash import flash_attention  # noqa: E402
from photonic_flash_attention_tpu.ops.flash_fp8 import (  # noqa: E402
    flash_attention_int8qk,
)

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, *, block_kv: int, sm_scale: float,
            causal: bool, q_start_blocks: int):
    """One q tile vs ALL kv tiles, unrolled in-body, SSA softmax state.

    q_ref: (block_q, D); k_ref/v_ref: (S, D) resident; o_ref: (block_q, D).
    """
    bq, d = q_ref.shape
    s_total = k_ref.shape[0]
    n_kv = s_total // block_kv
    qi = pl.program_id(2)

    q = q_ref[:].astype(jnp.bfloat16)
    m = jnp.full((bq, 128), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 128), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)

    q_row0 = (q_start_blocks + qi) * bq

    for j in range(n_kv):
        k = k_ref[pl.ds(j * block_kv, block_kv), :].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # (bq, block_kv)
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 0) + q_row0
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1) + j * block_kv
            s = jnp.where(col <= row, s, NEG_INF)
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        rep = block_kv // 128
        m_wide = m_next if rep == 1 else jnp.tile(m_next, (1, rep))
        p = jnp.exp(s - m_wide)
        alpha = jnp.exp(m - m_next)
        l = alpha * l + jnp.sum(p, axis=1, keepdims=True)
        m = m_next
        v = v_ref[pl.ds(j * block_kv, block_kv), :].astype(jnp.bfloat16)
        pv = jax.lax.dot(
            p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32
        )
        alpha_d = alpha[:, :d] if d <= 128 else jnp.tile(alpha, (1, d // 128))
        acc = acc * alpha_d + pv

    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    l_inv_d = l_inv[:, :d] if d <= 128 else jnp.tile(l_inv, (1, d // 128))
    o_ref[:] = (acc * l_inv_d).astype(o_ref.dtype)


def flash_unrolled(q, k, v, *, block_q=512, block_kv=512, causal=False,
                   sm_scale=None):
    """(B, S, H, D) flash forward with the kv loop unrolled in-body.

    K/V for one (b, h) stay VMEM-resident: S*D*2*2 bytes (4 MB at
    S=8192, D=128) — fine for the experiment's shapes.
    """
    b, s, h, d = q.shape
    hkv = k.shape[2]
    group = h // hkv
    scale = sm_scale if sm_scale is not None else d ** -0.5
    n_q = s // block_q

    kern = functools.partial(
        _kernel, block_kv=block_kv, sm_scale=scale, causal=causal,
        q_start_blocks=0,
    )
    # layout: (B, H, S, D) blocks
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    out = pl.pallas_call(
        lambda qr, kr, vr, orf: kern(
            qr.at[0, 0], kr.at[0, 0], vr.at[0, 0], orf.at[0, 0]
        ),
        grid=(b, h, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, s, d), lambda b_, h_, i: (b_, h_ // group, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda b_, h_, i: (b_, h_ // group, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda b_, h_, i: (b_, h_, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


def _bench(fn, q, k, v, iters):
    @functools.partial(jax.jit, static_argnums=3)
    def many(q, k, v, n):
        def body(c, _):
            return fn(c, k, v).astype(c.dtype), None

        out, _ = jax.lax.scan(body, q, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    def run(n):
        float(many(q, k, v, n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(q, k, v, n))
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = iters
    return (run(hi) - run(lo)) / (hi - lo)


def main():
    rng = np.random.default_rng(0)
    print("== parity ==", flush=True)
    q = jnp.asarray(rng.standard_normal((1, 1024, 2, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 1024, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 1024, 2, 64)), jnp.bfloat16)
    for causal in (False, True):
        a = flash_unrolled(q, k, v, causal=causal)
        r = flash_attention(q, k, v, causal=causal)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32))))
        print(f"causal={causal}: max abs err {err:.2e}", flush=True)
        assert err < 3e-2

    print("== perf ==", flush=True)
    cases = [
        ("bf16 d64 b1 s8192 noncausal", (1, 8192, 12, 12, 64), False, (512, 512)),
        ("bf16 d64 b4 s2048 causal", (4, 2048, 12, 12, 64), True, (512, 512)),
        ("bf16 d128gqa b4 s4096 causal", (4, 4096, 32, 8, 128), True, (512, 512)),
        ("bf16 d128gqa b4 s4096 noncausal", (4, 4096, 32, 8, 128), False, (512, 512)),
    ]
    for name, (b_, s_, h_, hkv_, d_), causal, (bqq, bkk) in cases:
        qq = jnp.asarray(rng.standard_normal((b_, s_, h_, d_)), jnp.bfloat16)
        kk = jnp.asarray(rng.standard_normal((b_, s_, hkv_, d_)), jnp.bfloat16)
        vv = jnp.asarray(rng.standard_normal((b_, s_, hkv_, d_)), jnp.bfloat16)
        frac = 0.5 if causal else 1.0
        fl = 4 * b_ * h_ * s_ * s_ * d_ * frac
        est_ms = fl / 60e12 * 1e3
        hi = max(30, int(60.0 / est_ms))
        it = (hi // 10, hi)
        try:
            t_new = _bench(
                lambda a, b2, c: flash_unrolled(
                    a, b2, c, causal=causal, block_q=bqq, block_kv=bkk
                ),
                qq, kk, vv, it,
            )
        except Exception as e:
            print(f"{name}: unrolled FAIL {str(e)[:120]}", flush=True)
            continue
        t_ref = _bench(
            lambda a, b2, c: flash_attention(
                a, b2, c, causal=causal, block_q=bqq, block_kv=bkk
            ),
            qq, kk, vv, it,
        )
        print(
            f"{name}: unrolled {t_new*1e3:.3f} ms ({fl/t_new/1e12:.1f} TF) "
            f"vs grid {t_ref*1e3:.3f} ms ({fl/t_ref/1e12:.1f} TF) "
            f"-> {t_ref/t_new:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
