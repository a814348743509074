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

    q_ref: (1,1,block_q,D); k_ref/v_ref: (1,1,S,D) resident;
    o_ref: (1,1,block_q,D).
    """
    bq, d = q_ref.shape[2], q_ref.shape[3]
    s_total = k_ref.shape[2]
    n_kv = s_total // block_kv
    qi = pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.bfloat16)
    m = jnp.full((bq, 128), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 128), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)

    q_row0 = (q_start_blocks + qi) * bq

    for j in range(n_kv):
        k = k_ref[0, 0, pl.ds(j * block_kv, block_kv), :].astype(jnp.bfloat16)
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
        v = v_ref[0, 0, pl.ds(j * block_kv, block_kv), :].astype(jnp.bfloat16)
        pv = jax.lax.dot(
            p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32
        )
        alpha_d = alpha[:, :d] if d <= 128 else jnp.tile(alpha, (1, d // 128))
        acc = acc * alpha_d + pv

    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    l_inv_d = l_inv[:, :d] if d <= 128 else jnp.tile(l_inv, (1, d // 128))
    o_ref[0, 0] = (acc * l_inv_d).astype(o_ref.dtype)


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
        kern,
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


# ---------------------------------------------------------------------------
# Variant 2: chunked-unrolled — grid over kv CHUNKS of U tiles, scratch-
# carried state, chunk-level causal skip (DMA-redirect via index map),
# in-body unroll inside each chunk. VMEM-safe at any S; causal keeps its
# tile skipping at chunk granularity.
# ---------------------------------------------------------------------------


def _kernel_chunked(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, *,
                    block_kv: int, unroll: int, sm_scale: float,
                    causal: bool, num_chunks: int):
    bq, d = q_ref.shape[2], q_ref.shape[3]
    qi = pl.program_id(2)
    kc = pl.program_id(3)
    q_row0 = qi * bq
    span = block_kv * unroll

    @pl.when(kc == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    active = (not causal) or (kc * span <= q_row0 + bq - 1)
    if causal:
        active = kc * span <= q_row0 + bq - 1

    @pl.when(active if causal else True)
    def _run():
        q = q_ref[0, 0].astype(jnp.bfloat16)
        m = m_s[:]
        l = l_s[:]
        acc = acc_s[:]
        for j in range(unroll):
            k = k_ref[0, 0, pl.ds(j * block_kv, block_kv), :].astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale
            if causal:
                row = jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 0) + q_row0
                col = (
                    jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1)
                    + kc * span + j * block_kv
                )
                s = jnp.where(col <= row, s, NEG_INF)
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m, m_curr)
            rep = block_kv // 128
            m_wide = m_next if rep == 1 else jnp.tile(m_next, (1, rep))
            p = jnp.exp(s - m_wide)
            alpha = jnp.exp(m - m_next)
            l = alpha * l + jnp.sum(p, axis=1, keepdims=True)
            m = m_next
            v = v_ref[0, 0, pl.ds(j * block_kv, block_kv), :].astype(jnp.bfloat16)
            pv = jax.lax.dot(
                p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32
            )
            alpha_d = alpha[:, :d] if d <= 128 else jnp.tile(alpha, (1, d // 128))
            acc = acc * alpha_d + pv
        m_s[:] = m
        l_s[:] = l
        acc_s[:] = acc

    @pl.when(kc == num_chunks - 1)
    def _store():
        l = l_s[:]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        l_inv_d = l_inv[:, :d] if d <= 128 else jnp.tile(l_inv, (1, d // 128))
        o_ref[0, 0] = (acc_s[:] * l_inv_d).astype(o_ref.dtype)


def flash_chunked(q, k, v, *, block_q=512, block_kv=512, unroll=4,
                  causal=False, sm_scale=None):
    b, s, h, d = q.shape
    hkv = k.shape[2]
    group = h // hkv
    scale = sm_scale if sm_scale is not None else d ** -0.5
    n_q = s // block_q
    span = block_kv * unroll
    n_c = s // span

    kern = functools.partial(
        _kernel_chunked, block_kv=block_kv, unroll=unroll, sm_scale=scale,
        causal=causal, num_chunks=n_c,
    )
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    def kv_map(b_, h_, i, c):
        if causal:
            # Redirect skipped future chunks at the first chunk (no dead
            # DMA variety; they are pl.when-inactive anyway).
            c = jnp.minimum(c, (i * block_q + block_q - 1) // span)
        return (b_, h_ // group, c, 0)

    out = pl.pallas_call(
        kern,
        grid=(b, h, n_q, n_c),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, c: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, span, d), kv_map),
            pl.BlockSpec((1, 1, span, d), kv_map),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda b_, h_, i, c: (b_, h_, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
        ),
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


def main2():
    rng = np.random.default_rng(0)
    print("== chunked parity ==", flush=True)
    q = jnp.asarray(rng.standard_normal((1, 2048, 2, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2048, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2048, 2, 64)), jnp.bfloat16)
    for causal in (False, True):
        for bqq, bkk, u in [(512, 512, 2), (512, 256, 4), (1024, 256, 4)]:
            a = flash_chunked(q, k, v, causal=causal, block_q=bqq,
                              block_kv=bkk, unroll=u)
            r = flash_attention(q, k, v, causal=causal)
            err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32))))
            print(f"causal={causal} bq={bqq} bkv={bkk} u={u}: err {err:.2e}", flush=True)
            assert err < 3e-2

    print("== chunked perf ==", flush=True)
    cases = [
        ("d64 b4 s2048 causal", (4, 2048, 12, 12, 64), True),
        ("d64 b1 s8192 causal", (1, 8192, 12, 12, 64), True),
        ("d64 b1 s8192 noncausal", (1, 8192, 12, 12, 64), False),
        ("d128gqa b4 s4096 causal", (4, 4096, 32, 8, 128), True),
        ("d128gqa b4 s4096 noncausal", (4, 4096, 32, 8, 128), False),
    ]
    cfgs = [(512, 512, 2), (512, 256, 4), (1024, 256, 4), (1024, 512, 2), (512, 512, 4)]
    for name, (b_, s_, h_, hkv_, d_), causal in cases:
        qq = jnp.asarray(rng.standard_normal((b_, s_, h_, d_)), jnp.bfloat16)
        kk = jnp.asarray(rng.standard_normal((b_, s_, hkv_, d_)), jnp.bfloat16)
        vv = jnp.asarray(rng.standard_normal((b_, s_, hkv_, d_)), jnp.bfloat16)
        frac = 0.5 if causal else 1.0
        fl = 4 * b_ * h_ * s_ * s_ * d_ * frac
        est_ms = fl / 60e12 * 1e3
        hi = max(30, int(60.0 / est_ms))
        it = (hi // 10, hi)
        t_ref = _bench(
            lambda a, b2, c: flash_attention(a, b2, c, causal=causal),
            qq, kk, vv, it,
        )
        print(f"{name}: grid(default) {t_ref*1e3:.3f} ms ({fl/t_ref/1e12:.1f} TF)", flush=True)
        for bqq, bkk, u in cfgs:
            if s_ % (bkk * u) or s_ % bqq:
                continue
            try:
                t = _bench(
                    lambda a, b2, c: flash_chunked(
                        a, b2, c, causal=causal, block_q=bqq, block_kv=bkk, unroll=u
                    ),
                    qq, kk, vv, it,
                )
                print(
                    f"  chunked bq={bqq} bkv={bkk} u={u}: {t*1e3:.3f} ms "
                    f"({fl/t/1e12:.1f} TF) -> {t_ref/t:.2f}x",
                    flush=True,
                )
            except Exception as e:
                print(f"  chunked bq={bqq} bkv={bkk} u={u}: FAIL {str(e)[:90]}", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "chunked":
    main2()


# ---------------------------------------------------------------------------
# Variant 3: triangular — one pallas_call per q row-block with a STATIC
# kv extent (i+1 tiles for row i). Zero diagonal waste, full in-body
# unroll with SSA state, no scratch carry. n_q kernels compile per shape.
# ---------------------------------------------------------------------------


def _kernel_tri(q_ref, k_ref, v_ref, o_ref, *, block_kv: int,
                sm_scale: float, q_row0: int, mask_last: bool):
    bq, d = q_ref.shape[2], q_ref.shape[3]
    s_kv = k_ref.shape[2]
    n_kv = s_kv // block_kv

    q = q_ref[0, 0].astype(jnp.bfloat16)
    m = jnp.full((bq, 128), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 128), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)

    for j in range(n_kv):
        k = k_ref[0, 0, pl.ds(j * block_kv, block_kv), :].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        # Only tiles overlapping the diagonal need the causal mask.
        if mask_last and (j + 1) * block_kv > q_row0:
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
        v = v_ref[0, 0, pl.ds(j * block_kv, block_kv), :].astype(jnp.bfloat16)
        pv = jax.lax.dot(
            p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32
        )
        alpha_d = alpha[:, :d] if d <= 128 else jnp.tile(alpha, (1, d // 128))
        acc = acc * alpha_d + pv

    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    l_inv_d = l_inv[:, :d] if d <= 128 else jnp.tile(l_inv, (1, d // 128))
    o_ref[0, 0] = (acc * l_inv_d).astype(o_ref.dtype)


def flash_triangular(q, k, v, *, block_q=512, block_kv=512, sm_scale=None):
    """Causal flash: one static-extent unrolled call per q row-block."""
    b, s, h, d = q.shape
    hkv = k.shape[2]
    group = h // hkv
    scale = sm_scale if sm_scale is not None else d ** -0.5
    n_q = s // block_q

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    outs = []
    for i in range(n_q):
        kv_len = min((i * block_q + block_q + block_kv - 1) // block_kv, s // block_kv)
        span = kv_len * block_kv
        kern = functools.partial(
            _kernel_tri, block_kv=block_kv, sm_scale=scale,
            q_row0=i * block_q, mask_last=True,
        )
        o_i = pl.pallas_call(
            kern,
            grid=(b, h),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i=i: (b_, h_, i, 0)),
                pl.BlockSpec((1, 1, span, d), lambda b_, h_: (b_, h_ // group, 0, 0)),
                pl.BlockSpec((1, 1, span, d), lambda b_, h_: (b_, h_ // group, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b_, h_: (b_, h_, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h, block_q, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(qt, kt, vt)
        outs.append(o_i)
    out = jnp.concatenate(outs, axis=2)
    return out.transpose(0, 2, 1, 3)


def main3():
    rng = np.random.default_rng(0)
    print("== triangular parity ==", flush=True)
    q = jnp.asarray(rng.standard_normal((1, 2048, 2, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2048, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2048, 2, 64)), jnp.bfloat16)
    a = flash_triangular(q, k, v)
    r = flash_attention(q, k, v, causal=True)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32))))
    print(f"err {err:.2e}", flush=True)
    assert err < 3e-2

    print("== triangular perf (causal) ==", flush=True)
    cases = [
        ("d64 b4 s2048", (4, 2048, 12, 12, 64)),
        ("d64 b1 s8192", (1, 8192, 12, 12, 64)),
        ("d128gqa b4 s4096", (4, 4096, 32, 8, 128)),
    ]
    for name, (b_, s_, h_, hkv_, d_) in cases:
        qq = jnp.asarray(rng.standard_normal((b_, s_, h_, d_)), jnp.bfloat16)
        kk = jnp.asarray(rng.standard_normal((b_, s_, hkv_, d_)), jnp.bfloat16)
        vv = jnp.asarray(rng.standard_normal((b_, s_, hkv_, d_)), jnp.bfloat16)
        fl = 4 * b_ * h_ * s_ * s_ * d_ * 0.5
        est_ms = fl / 60e12 * 1e3
        hi = max(30, int(60.0 / est_ms))
        it = (hi // 10, hi)
        t_ref = _bench(
            lambda a, b2, c: flash_attention(a, b2, c, causal=True),
            qq, kk, vv, it,
        )
        for bqq, bkk in [(512, 512), (1024, 512), (512, 256)]:
            if s_ % bqq or s_ % bkk:
                continue
            try:
                t = _bench(
                    lambda a, b2, c: flash_triangular(
                        a, b2, c, block_q=bqq, block_kv=bkk
                    ),
                    qq, kk, vv, it,
                )
                print(
                    f"{name} tri bq={bqq} bkv={bkk}: {t*1e3:.3f} ms "
                    f"({fl/t/1e12:.1f} TF) vs grid {t_ref*1e3:.3f} ms "
                    f"({fl/t_ref/1e12:.1f} TF) -> {t_ref/t:.2f}x",
                    flush=True,
                )
            except Exception as e:
                print(f"{name} tri bq={bqq} bkv={bkk}: FAIL {str(e)[:90]}", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "tri":
    main3()


# ---------------------------------------------------------------------------
# Variant 4: int8-QK triangular/unrolled — per-tensor-scale int8 score
# matmul (the ops/flash_fp8.py trick) inside the unrolled body.
# ---------------------------------------------------------------------------


def _kernel_tri_i8(q_ref, k_ref, v_ref, scale_ref, o_ref, *, block_kv: int,
                   q_row0: int, causal: bool):
    bq, d = q_ref.shape[2], q_ref.shape[3]
    s_kv = k_ref.shape[2]
    n_kv = s_kv // block_kv

    q = q_ref[0, 0]  # int8
    m = jnp.full((bq, 128), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 128), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)

    for j in range(n_kv):
        k = k_ref[0, 0, pl.ds(j * block_kv, block_kv), :]  # int8
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * scale_ref[0]
        if causal and (j + 1) * block_kv > q_row0:
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
        v = v_ref[0, 0, pl.ds(j * block_kv, block_kv), :].astype(jnp.bfloat16)
        pv = jax.lax.dot(
            p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32
        )
        alpha_d = alpha[:, :d] if d <= 128 else jnp.tile(alpha, (1, d // 128))
        acc = acc * alpha_d + pv

    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    l_inv_d = l_inv[:, :d] if d <= 128 else jnp.tile(l_inv, (1, d // 128))
    o_ref[0, 0] = (acc * l_inv_d).astype(o_ref.dtype)


def _quant_pt(x):
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    sc = jnp.where(absmax == 0.0, 1.0, absmax / 127.0)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sc), -127, 127).astype(jnp.int8)
    return xq, sc


def flash_tri_i8(q, k, v, *, block_q=512, block_kv=512, causal=True,
                 sm_scale=None):
    b, s, h, d = q.shape
    hkv = k.shape[2]
    group = h // hkv
    scale = sm_scale if sm_scale is not None else d ** -0.5
    n_q = s // block_q

    qq, qs = _quant_pt(q)
    kq, ks = _quant_pt(k)
    score_scale = (qs * ks * scale).reshape(1).astype(jnp.float32)

    qt = qq.transpose(0, 2, 1, 3)
    kt = kq.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    outs = []
    for i in range(n_q):
        if causal:
            kv_len = min((i * block_q + block_q + block_kv - 1) // block_kv,
                         s // block_kv)
        else:
            kv_len = s // block_kv
        span = kv_len * block_kv
        kern = functools.partial(
            _kernel_tri_i8, block_kv=block_kv, q_row0=i * block_q,
            causal=causal,
        )
        o_i = pl.pallas_call(
            kern,
            grid=(b, h),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i=i: (b_, h_, i, 0)),
                pl.BlockSpec((1, 1, span, d), lambda b_, h_: (b_, h_ // group, 0, 0)),
                pl.BlockSpec((1, 1, span, d), lambda b_, h_: (b_, h_ // group, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b_, h_: (b_, h_, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h, block_q, d), v.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(qt, kt, vt, score_scale)
        outs.append(o_i)
        if not causal:
            # non-causal: every row identical extent -> single call would
            # be the full-unroll variant; keep per-row for code sharing.
            pass
    out = jnp.concatenate(outs, axis=2)
    return out.transpose(0, 2, 1, 3)


def main4():
    rng = np.random.default_rng(0)
    print("== tri-i8 parity ==", flush=True)
    q = jnp.asarray(rng.standard_normal((1, 2048, 2, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2048, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2048, 2, 64)), jnp.bfloat16)
    a = flash_tri_i8(q, k, v, causal=True)
    r = flash_attention(q, k, v, causal=True)
    rel = float(jnp.max(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)))
                / (jnp.max(jnp.abs(r.astype(jnp.float32))) + 1e-9))
    print(f"rel err {rel:.2e}", flush=True)
    assert rel < 5e-2

    print("== tri-i8 perf ==", flush=True)
    cases = [
        ("d64 b4 s2048 causal", (4, 2048, 12, 12, 64), True),
        ("d128gqa b4 s4096 causal", (4, 4096, 32, 8, 128), True),
        ("d128gqa b4 s4096 noncausal", (4, 4096, 32, 8, 128), False),
        ("d64 b1 s8192 causal", (1, 8192, 12, 12, 64), True),
    ]
    for name, (b_, s_, h_, hkv_, d_), causal in cases:
        qq = jnp.asarray(rng.standard_normal((b_, s_, h_, d_)), jnp.bfloat16)
        kk = jnp.asarray(rng.standard_normal((b_, s_, hkv_, d_)), jnp.bfloat16)
        vv = jnp.asarray(rng.standard_normal((b_, s_, hkv_, d_)), jnp.bfloat16)
        frac = 0.5 if causal else 1.0
        fl = 4 * b_ * h_ * s_ * s_ * d_ * frac
        est_ms = fl / 80e12 * 1e3
        hi = max(30, int(60.0 / est_ms))
        it = (hi // 10, hi)
        t_i8 = _bench(
            lambda a, b2, c: flash_tri_i8(a, b2, c, causal=causal),
            qq, kk, vv, it,
        )
        t_ref = _bench(
            lambda a, b2, c: flash_attention_int8qk(a, b2, c, causal=causal),
            qq, kk, vv, it,
        )
        print(
            f"{name}: tri-i8 {t_i8*1e3:.3f} ms ({fl/t_i8/1e12:.1f} TF) vs "
            f"grid-int8qk {t_ref*1e3:.3f} ms ({fl/t_ref/1e12:.1f} TF) "
            f"-> {t_ref/t_i8:.2f}x",
            flush=True,
        )


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "i8":
    main4()


# ---------------------------------------------------------------------------
# Variant 5: segmented-triangular for LONG S — per q row-block, the kv
# extent splits into segments of <= SEG tiles; each segment is one
# unrolled call with lse output; segments merge by logsumexp in XLA.
# Extends the unrolled win past the 16-tile scoped-VMEM envelope
# (S=16K-64K currently rides the grid kernel at ~65% of composite).
# ---------------------------------------------------------------------------


def flash_segmented(q, k, v, *, causal=True, block_q=512, block_kv=512,
                    seg_tiles=12, sm_scale=None):
    """(B, S, H, D). Causal; per q row-block: ceil(extent/seg) unrolled
    calls merged by lse."""
    from photonic_flash_attention_tpu.ops.flash_unrolled import (
        unrolled_fwd_bhsd,
    )
    from photonic_flash_attention_tpu.parallel.ring import softmax_merge

    b, s, h, d = q.shape
    scale = sm_scale if sm_scale is not None else d ** -0.5
    n_q = s // block_q
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    assert block_q == block_kv, "diagonal alignment needs square tiles"
    outs = []
    for i in range(n_q):
        kv_tiles = (i + 1) if causal else s // block_kv
        q_blk = qt[:, :, i * block_q:(i + 1) * block_q, :]
        o_acc = None
        lse_acc = None
        # Segments: interior tiles [0, i) in non-causal chunks, then the
        # diagonal tile [i, i+1) as its own causal call (local coords
        # align exactly there: q_row0 = 0 and kv col 0 = global col
        # i*block_kv = global row start).
        segments = []
        interior = (kv_tiles - 1) if causal else kv_tiles
        start = 0
        while start < interior:
            seg = min(seg_tiles, interior - start)
            segments.append((start, seg, False))
            start += seg
        if causal:
            segments.append((kv_tiles - 1, 1, True))
        for start, seg, diag in segments:
            k_seg = kt[:, :, start * block_kv:(start + seg) * block_kv, :]
            v_seg = vt[:, :, start * block_kv:(start + seg) * block_kv, :]
            o_i, lse_i = unrolled_fwd_bhsd(
                q_blk, k_seg, v_seg,
                causal=diag,
                sm_scale=scale, save_lse=True,
                block_q=block_q, block_kv=block_kv,
            )
            if o_acc is None:
                o_acc, lse_acc = o_i.astype(jnp.float32), lse_i
            else:
                # softmax_merge expects (B, S, H, D)/(B, H, S): adapt in
                # bhsd domain manually.
                m = jnp.maximum(lse_acc, lse_i)
                m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
                w1 = jnp.where(jnp.isfinite(lse_acc), jnp.exp(lse_acc - m_safe), 0.0)
                w2 = jnp.where(jnp.isfinite(lse_i), jnp.exp(lse_i - m_safe), 0.0)
                den = jnp.where(w1 + w2 == 0.0, 1.0, w1 + w2)
                o_acc = (
                    o_acc * (w1 / den)[..., None]
                    + o_i.astype(jnp.float32) * (w2 / den)[..., None]
                )
                lse_acc = m_safe + jnp.log(den)
        outs.append(o_acc.astype(q.dtype))
    out = jnp.concatenate(outs, axis=2)
    return out.transpose(0, 2, 1, 3)


def main5():
    rng = np.random.default_rng(0)
    print("== segmented parity ==", flush=True)
    # S=2048 with seg 2 exercises multi-segment merge + diagonal seg.
    q = jnp.asarray(rng.standard_normal((1, 2048, 2, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2048, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2048, 2, 64)), jnp.bfloat16)
    a = flash_segmented(q, k, v, causal=True, seg_tiles=2)
    r = flash_attention(q, k, v, causal=True)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32))))
    print(f"err {err:.2e}", flush=True)
    assert err < 3e-2, err

    print("== segmented perf (causal) ==", flush=True)
    for name, (b_, s_, h_, d_) in [
        ("d64 b1 s16384", (1, 16384, 4, 64)),
        ("d64 b1 s32768", (1, 32768, 2, 64)),
    ]:
        qq = jnp.asarray(rng.standard_normal((b_, s_, h_, d_)), jnp.bfloat16)
        kk = jnp.asarray(rng.standard_normal((b_, s_, h_, d_)), jnp.bfloat16)
        vv = jnp.asarray(rng.standard_normal((b_, s_, h_, d_)), jnp.bfloat16)
        fl = 4 * b_ * h_ * s_ * s_ * d_ * 0.5
        est_ms = fl / 70e12 * 1e3
        hi = max(20, int(60.0 / est_ms))
        it = (hi // 10, hi)
        t_g = _bench(lambda a, b2, c: flash_attention(a, b2, c, causal=True), qq, kk, vv, it)
        try:
            t_s = _bench(
                lambda a, b2, c: flash_segmented(a, b2, c, causal=True, seg_tiles=12),
                qq, kk, vv, it,
            )
            print(f"{name}: segmented {t_s*1e3:.2f} ms ({fl/t_s/1e12:.1f} TF) vs grid {t_g*1e3:.2f} ms ({fl/t_g/1e12:.1f} TF) -> {t_g/t_s:.2f}x", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "seg":
    main5()


# ---------------------------------------------------------------------------
# Variant 6: full-triangle single call — ALL q rows' tiles in ONE
# straight-line body (grid = (b, h)). The triangular per-row calls cap
# in-body overlap at the row extent (1-4 tiles at the headline
# geometry); fusing the whole triangle gives the scheduler the maximal
# straight-line window. Scoped-VMEM-bound: total tiles n(n+1)/2 <= ~16
# -> S <= 2560 at 512x512. Aimed squarely at the headline row.
# ---------------------------------------------------------------------------


def _kernel_fulltri(q_ref, k_ref, v_ref, o_ref, *, block_q: int,
                    block_kv: int, sm_scale: float):
    s, d = q_ref.shape[2], q_ref.shape[3]
    n_q = s // block_q
    for i in range(n_q):
        q = q_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.bfloat16)
        m = jnp.full((block_q, 128), NEG_INF, jnp.float32)
        l = jnp.zeros((block_q, 128), jnp.float32)
        acc = jnp.zeros((block_q, d), jnp.float32)
        kv_tiles = (i * block_q + block_q + block_kv - 1) // block_kv
        for j in range(kv_tiles):
            kk = k_ref[0, 0, pl.ds(j * block_kv, block_kv), :].astype(jnp.bfloat16)
            st = jax.lax.dot_general(
                q, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale
            if (j + 1) * block_kv > i * block_q:
                row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0) + i * block_q
                col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1) + j * block_kv
                st = jnp.where(col <= row, st, NEG_INF)
            m_curr = jnp.max(st, axis=1, keepdims=True)
            m_next = jnp.maximum(m, m_curr)
            rep = block_kv // 128
            m_wide = m_next if rep == 1 else jnp.tile(m_next, (1, rep))
            p = jnp.exp(st - m_wide)
            alpha = jnp.exp(m - m_next)
            l = alpha * l + jnp.sum(p, axis=1, keepdims=True)
            m = m_next
            vv = v_ref[0, 0, pl.ds(j * block_kv, block_kv), :].astype(jnp.bfloat16)
            pv = jax.lax.dot(
                p.astype(jnp.bfloat16), vv, preferred_element_type=jnp.float32
            )
            alpha_d = alpha[:, :d] if d <= 128 else jnp.tile(alpha, (1, d // 128))
            acc = acc * alpha_d + pv
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        l_inv_d = l_inv[:, :d] if d <= 128 else jnp.tile(l_inv, (1, d // 128))
        o_ref[0, 0, pl.ds(i * block_q, block_q), :] = (acc * l_inv_d).astype(o_ref.dtype)


def flash_fulltri(q, k, v, *, block_q=512, block_kv=512, sm_scale=None):
    b, s, h, d = q.shape
    hkv = k.shape[2]
    group = h // hkv
    scale = sm_scale if sm_scale is not None else d ** -0.5
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    kern = functools.partial(
        _kernel_fulltri, block_q=block_q, block_kv=block_kv, sm_scale=scale
    )
    out = pl.pallas_call(
        kern,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, s, d), lambda b_, h_: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda b_, h_: (b_, h_ // group, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda b_, h_: (b_, h_ // group, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, s, d), lambda b_, h_: (b_, h_, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


def main6():
    rng = np.random.default_rng(0)
    print("== fulltri parity ==", flush=True)
    q = jnp.asarray(rng.standard_normal((1, 1024, 2, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 1024, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 1024, 2, 64)), jnp.bfloat16)
    a = flash_fulltri(q, k, v, block_q=256, block_kv=256)
    r = flash_attention(q, k, v, causal=True)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32))))
    print(f"err {err:.2e}", flush=True)
    assert err < 3e-2

    print("== fulltri perf (headline geometry) ==", flush=True)
    from photonic_flash_attention_tpu.ops.flash_unrolled import (
        flash_attention_unrolled,
    )
    for name, (b_, s_, h_, d_) in [
        ("d64 b4 s2048", (4, 2048, 12, 64)),
        ("d128gqa b4 s2048", (4, 2048, 32, 128)),
    ]:
        qq = jnp.asarray(rng.standard_normal((b_, s_, h_, d_)), jnp.bfloat16)
        hkv_ = h_ // 4 if d_ == 128 else h_
        kk = jnp.asarray(rng.standard_normal((b_, s_, hkv_, d_)), jnp.bfloat16)
        vv = jnp.asarray(rng.standard_normal((b_, s_, hkv_, d_)), jnp.bfloat16)
        fl = 4 * b_ * h_ * s_ * s_ * d_ * 0.5
        est_ms = fl / 70e12 * 1e3
        hi = max(30, int(60.0 / est_ms))
        it = (hi // 10, hi)
        t_tri = _bench(
            lambda a, b2, c: flash_attention_unrolled(a, b2, c, causal=True),
            qq, kk, vv, it,
        )
        try:
            t_ft = _bench(
                lambda a, b2, c: flash_fulltri(a, b2, c),
                qq, kk, vv, it,
            )
            print(
                f"{name}: fulltri {t_ft*1e3:.3f} ms ({fl/t_ft/1e12:.1f} TF) "
                f"vs per-row tri {t_tri*1e3:.3f} ms ({fl/t_tri/1e12:.1f} TF) "
                f"-> {t_tri/t_ft:.2f}x",
                flush=True,
            )
        except Exception as e:
            print(f"{name}: fulltri FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "fulltri":
    main6()
