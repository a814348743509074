"""Fixed-max flash attention experiment (VFA-style, PAPERS.md #5).

At D=64 the flash kernel is VPU-bound: the per-tile online-softmax
bookkeeping (running-max reduce, alpha = exp(m_prev - m_next), the
accumulator rescale) competes with the dominant exp(s) on the same
vector unit. VFA's observation: with a PRECOMPUTED upper bound M on
each query row's scores, the recurrence degenerates —

    p = exp(s - M);  l += sum(p);  acc += p @ V        (no max, no alpha)

and the final ``acc / l`` cancels the uniform exp(-(M - m_true))
factor exactly, so the result is identical in infinite precision and
f32-accumulation-safe as long as M - m_true < ~80 (f32 exp underflow).
The bound is Cauchy-Schwarz: M_row = scale * ||q_row||_2 * max_j ||k_j||_2,
computed in O(S*D) prolog XLA (vs the kernel's O(S^2*D)).

This harness measures a minimal standalone kernel (no GQA/streams)
against the production kernel's timing at the same geometry, and checks
numerics vs the oracle. Run on TPU: python benchmarks/flash_fixedmax_experiment.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from photonic_flash_attention_tpu.ops.flash import flash_attention  # noqa: E402
from photonic_flash_attention_tpu.ops.reference import (  # noqa: E402
    DEFAULT_MASK_VALUE,
    attention_reference,
)

NUM_LANES = 128


def _kernel(
    fm_ref,  # (1, 1, block_q, 128) per-row fixed max, lane-replicated
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    l_scratch,
    acc_scratch,
    *,
    sm_scale: float,
    causal: bool,
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
    fast_exp: bool = False,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    if causal:
        should_run = ki * block_kv <= (qi + 1) * block_q - 1
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        if causal:
            row = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
                + qi * block_q
            )
            col = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
                + ki * block_kv
            )
            s = jnp.where(col <= row, s, DEFAULT_MASK_VALUE)
        fm = fm_ref[0, 0]  # (block_q, 128)
        rep = block_kv // NUM_LANES
        fm_w = fm if rep == 1 else jnp.tile(fm, (1, rep))
        x = s - fm_w
        if fast_exp:
            # Schraudolph bit-trick exp: one FMA + cast + bitcast instead
            # of the transcendental (~2% rel err on p; normalization
            # cancels part of it). x <= 0 here so no overflow; clamp the
            # underflow side to the denormal boundary.
            xi = jnp.clip(
                x * jnp.float32(12102203.0) + jnp.float32(1064986823.0),
                jnp.float32(8388608.0),
                jnp.float32(2139095039.0),
            ).astype(jnp.int32)
            p = jax.lax.bitcast_convert_type(xi, jnp.float32)
        else:
            p = jnp.exp(x)  # <= exp(0); no running max, no alpha
        l_scratch[:] = l_scratch[:] + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0, 0],
            preferred_element_type=jnp.float32,
        )
        acc_scratch[:] = acc_scratch[:] + pv  # plain sum: no rescale

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        l = l_scratch[:]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        d_ = acc_scratch.shape[-1]
        l_inv_d = l_inv[:, :d_] if d_ <= NUM_LANES else jnp.tile(
            l_inv, (1, d_ // NUM_LANES)
        )
        o_ref[0, 0] = (acc_scratch[:] * l_inv_d).astype(o_ref.dtype)


def flash_fixedmax(q, k, v, *, causal=False, sm_scale=None, block_q=512,
                   block_kv=512, fast_exp=False):
    """q/k/v: (B, S, H, D) -> (B, S, H, D). Minimal: no GQA, S % block == 0."""
    b, s, h, d = q.shape
    scale = sm_scale if sm_scale is not None else d ** -0.5
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    # Prolog: per-row score upper bound (O(S*D), XLA).
    qn = jnp.linalg.norm(qt.astype(jnp.float32), axis=-1)  # (B, H, S)
    kmax = jnp.max(
        jnp.linalg.norm(kt.astype(jnp.float32), axis=-1), axis=-1
    )  # (B, H)
    fm = (qn * kmax[..., None]) * scale  # (B, H, S)
    fm_tiles = jnp.broadcast_to(fm[..., None], (*fm.shape, NUM_LANES))

    grid = (b, h, s // block_q, s // block_kv)
    kernel = functools.partial(
        _kernel,
        sm_scale=scale,
        causal=causal,
        block_q=block_q,
        block_kv=block_kv,
        num_kv_blocks=s // block_kv,
        fast_exp=fast_exp,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, NUM_LANES), lambda b_, h_, qi, ki: (b_, h_, qi, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_q, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(fm_tiles, qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


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


def bench(fn, q, k, v, iters=(8, 40)):
    lo, hi = iters
    return (_timed(fn, q, k, v, hi) - _timed(fn, q, k, v, lo)) / (hi - lo)


def main():
    rng = np.random.default_rng(0)
    for name, (b, s, h, d), causal in [
        ("b4_s2048_h12_d64_causal", (4, 2048, 12, 64), True),
        ("b1_s8192_h12_d64_causal", (1, 8192, 12, 64), True),
        ("b1_s8192_h12_d64_nc", (1, 8192, 12, 64), False),
    ]:
        q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        # numerics first (small fp32 slice)
        qs, ks, vs = (x[:1, :1024].astype(jnp.float32) for x in (q, k, v))
        out = flash_fixedmax(qs, ks, vs, causal=causal)
        ref, _ = attention_reference(qs, ks, vs, causal=causal)
        err = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        frac = 0.5 if causal else 1.0
        flops = 4.0 * b * h * s * s * d * frac
        t_fixed = bench(
            functools.partial(flash_fixedmax, causal=causal), q, k, v
        )
        t_fast = bench(
            functools.partial(flash_fixedmax, causal=causal, fast_exp=True),
            q, k, v,
        )
        out_f = flash_fixedmax(qs, ks, vs, causal=causal, fast_exp=True)
        err_f = float(jnp.linalg.norm(out_f - ref) / jnp.linalg.norm(ref))
        t_base = bench(
            functools.partial(
                flash_attention, causal=causal, block_q=512, block_kv=512
            ),
            q, k, v,
        )
        print(
            f"{name}: fixedmax {t_fixed*1e3:.3f} ms ({flops/t_fixed/1e12:.1f}"
            f" TF/s) fastexp {t_fast*1e3:.3f} ms ({flops/t_fast/1e12:.1f})"
            f" vs flash {t_base*1e3:.3f} ms ({flops/t_base/1e12:.1f})"
            f"  rel-err {err:.2e} fast-err {err_f:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
