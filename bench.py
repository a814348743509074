#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

Headline metric (stable across rounds): flash-attention causal prefill
throughput (tokens/s) on one chip at the reference's benchmark geometry
(d=768, h=12 — reference cli.py:24-35 grid; S=2048 is its long-seq
regime where the README claims 4.9-9.9x speedups, README.md:659-661).

``vs_baseline``: speedup over XLA-fused naive attention on the SAME chip
— the honest analogue of the reference's photonic-vs-GPU ratio (their
"GPU baseline" was their own standard path).

Round 4 additions (VERDICT r3 #1-#3, #7, #10):
* measured HBM READ bandwidth calibration (Pallas DMA probe,
  ops/hbm_bw.py) and ``pct_of_measured_hbm`` on every decode row,
* decode rows at serving-realistic geometries (B16/KV4096/GQA/D128,
  B32/KV2048/D64) through the round-4 head-folded kernel,
* D=128 GQA prefill rows (Llama geometry) where the full MXU width
  applies,
* the per-tensor-scale quantized kernels (int8qk / int8full / fp8qk),
* a training row (fwd+bwd via the Pallas backward kernels),
* a GPT-2-medium continuous-batching serving row (mixed
  prefill+decode tokens/s).

Timing methodology: the iteration loop runs INSIDE one jitted
``lax.scan`` (output chained into the next call so nothing is
dead-code-eliminated), and per-iteration time is the slope of a linear
fit across two iteration counts. This cancels the fixed host->device
dispatch + fetch round-trip, which through tunneled remote runtimes is
~24 ms per call, and which a production serving loop amortizes by
pipelining. Two further rules (measured, see ops/hbm_bw.py): fetch the
FULL result (sliced fetches let XLA DCE whole columns through the
scan), and pass every large array as a jit ARGUMENT (large HLO
constants stream from HBM at half bandwidth: 356 vs 736 GB/s).
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS_LO, ITERS_HI = 20, 120

# v5e per-chip model ceilings at D=64 (half the 128-wide MXU contraction):
# bf16 peak 197 TFLOP/s -> 98.5; int8 peak 394 TOPS -> 197. int8-QK runs
# only the score matmul at the int8 rate (PV stays bf16): harmonic blend
# 2/(1/197 + 1/98.5) = 131.3. At D=128 the full MXU width applies.
CEILS = {
    (64, "bf16"): 98.5e12,
    (64, "int8"): 197.0e12,
    (64, "int8qk"): 131.3e12,
    (64, "fp8"): 98.5e12,  # v5e has no native fp8 MXU path
    (128, "bf16"): 197.0e12,
    (128, "int8"): 394.0e12,
    (128, "int8qk"): 262.7e12,
    (128, "fp8"): 197.0e12,
}


def _timed(fn, q, k, v, iters, repeats=3):
    @functools.partial(jax.jit, static_argnums=3)
    def many(q, k, v, n):
        def body(c, _):
            return fn(c, k, v).astype(c.dtype), None

        out, _ = jax.lax.scan(body, q, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    float(many(q, k, v, iters))  # compile + warm the fetch path
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(many(q, k, v, iters))
        best = min(best, time.perf_counter() - t0)
    return best


def _bench(fn, q, k, v, iters=(ITERS_LO, ITERS_HI)):
    """Per-iteration device time via linear fit over iteration counts."""
    lo, hi = iters
    t_lo = _timed(fn, q, k, v, lo)
    t_hi = _timed(fn, q, k, v, hi)
    return (t_hi - t_lo) / (hi - lo)


def _calibrate_matmul_tflops():
    """Measured XLA rate for the flash kernel's matmul pair: a QK-shaped
    (512, 64) @ (64, 512) batched matmul followed by a PV-shaped
    (512, 512) @ (512, 64) — the honest per-shape roofline the kernel
    competes against."""
    rng = np.random.default_rng(1)
    g = 48
    a = jnp.asarray(rng.standard_normal((g, 512, 64)), jnp.bfloat16)
    bmat = jnp.asarray(rng.standard_normal((g, 64, 512)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((512, 64)), jnp.bfloat16)

    def fn(c, bm, _v):
        s = jnp.einsum(
            "gmk,gkn->gmn", c, bm, preferred_element_type=jnp.float32
        )
        return (s.astype(jnp.bfloat16) @ w).astype(jnp.bfloat16)

    t = _bench(fn, a, bmat, bmat, iters=(40, 240))
    return 2 * (2 * g * 512 * 64 * 512) / t / 1e12


V5E_HBM_DATASHEET_GBPS = 819.0


def _calibrate_hbm_read_gbps():
    """Measured HBM READ bandwidth: a manual double-buffered Pallas DMA
    stream over a 256 MB jit ARGUMENT (ops/hbm_bw.py — the roofline
    memory-bound decode competes against).

    Round-5 audit (VERDICT r4 #1): 4 MB chunks and a fit window whose
    differenced device time is >= 50 ms (200 x ~0.34 ms). The round-4
    window (40 x 0.34 ms = 14 ms) was smaller than the ~24 ms tunneled
    host round-trip it was supposed to cancel, so probe AND decode rows
    carried +/-30% noise — the source of the unphysical 941 GB/s row.
    Clean methodology sustains ~750 GB/s (92% of the 819 datasheet),
    stable across chunk sizes 2-4 MB and queue depths 2-4.
    """
    from photonic_flash_attention_tpu.ops.hbm_bw import hbm_read_probe

    n_bytes = 256 * 1024 * 1024
    rows = n_bytes // 2 // 512

    @functools.partial(jax.jit, static_argnums=1)
    def many(x, n):
        def body(carry, _):
            x, acc = carry
            small = hbm_read_probe(x)
            return (x, acc + jnp.sum(small.astype(jnp.float32))), None

        (x, acc), _ = jax.lax.scan(
            body, (x, jnp.float32(0)), None, length=n
        )
        return acc

    x = jnp.ones((rows, 512), jnp.bfloat16)

    def run(n):
        float(many(x, n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t = (run(220) - run(20)) / 200
    return n_bytes / t / 1e9


def _decode_row(name, B, Hq, Hkv, D, S, page, hbm_gbps, pages_per_block=8):
    """INT8 paged-decode row through the head-folded kernel.

    Round-5 audit-proofing (VERDICT r4 #1):

    * **Serving-realistic pools**: the pool is padded to ~400 MB and the
      page tables are a random scatter over it. Round 4 sized the pool
      to exactly the tokens read (27 MB at b8) — small enough to be
      VMEM-resident on v5e (128 MB VMEM), and a linear-pool b8 row
      measures 827 GB/s (above both the 750 GB/s measured stream rate
      and the 819 datasheet) — VMEM traffic, not HBM. Scatter costs
      nothing by itself (random 96 KB+ DMAs sustain the same ~730 GB/s
      as sequential — measured, ops/hbm_bw.py methodology) but defeats
      residency and matches a fragmented serving pool.
    * **Pools generated on device** (jax.random): no 400 MB host upload
      through the tunnel, and still jit ARGUMENTS (constants stream at
      half bandwidth).
    * **Fit window scaled to the row**: iteration counts are chosen so
      the differenced device time is >= ~60 ms (see
      _calibrate_hbm_read_gbps on why 3 ms windows produced 130%-of-
      roofline fiction).
    * **Confirmation re-measure**: two independent fits; the row reports
      the SLOWER one (conservative), plus both, and flags itself
      ``suspect`` if they disagree by >10% or exceed 102% of the probe.

    Byte model audited against the kernel's actual DMAs: per token it
    moves Hkv*D int8 payload + one fp32 scale for each of K and V
    (kernel DMA tiles are (Hkv, D, page) payload + (Hkv, 1, page) fp32
    scales; q/o/page-table traffic is <0.5% and excluded).
    """
    from photonic_flash_attention_tpu.ops.paged import paged_attention_hf

    pps = S // page
    need = B * pps
    # Pad the pool to ~384 MB of payload so it cannot be VMEM-resident.
    bytes_per_page_kv = 2 * Hkv * D * page  # K+V int8
    num_pages = max(need + 1, int(384e6 / bytes_per_page_kv))
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    key = jax.random.PRNGKey(0)
    kp = jax.random.randint(key, (Hkv, num_pages, D, page), -127, 127, jnp.int8)
    vp = jax.random.randint(
        jax.random.PRNGKey(1), (Hkv, num_pages, D, page), -127, 127, jnp.int8
    )
    ks = jnp.full((Hkv, num_pages, page), 0.05, jnp.float32)
    vs = jnp.full((Hkv, num_pages, page), 0.05, jnp.float32)
    lengths = jnp.full((B,), S, jnp.int32)
    scatter = rng.permutation(num_pages - 1)[:need] + 1
    tables = jnp.asarray(scatter.reshape(B, pps), jnp.int32)

    @functools.partial(jax.jit, static_argnums=7)
    def many(q, kp, vp, ks, vs, lengths, tables, n):
        def body(c, _):
            o = paged_attention_hf(
                c, kp, vp, lengths, tables, ks, vs,
                pages_per_block=pages_per_block, num_buffers=4,
                int8_compute=False,
            )
            return o, None

        out, _ = jax.lax.scan(body, q, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    def run(n):
        float(many(q, kp, vp, ks, vs, lengths, tables, n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(q, kp, vp, ks, vs, lengths, tables, n))
            best = min(best, time.perf_counter() - t0)
        return best

    kv_bytes = B * S * Hkv * D * 2 + B * S * Hkv * 4 * 2  # payload + scales
    # Estimate per-iter time from the byte model at ~700 GB/s to size the
    # fit window (target >= 60 ms of differenced device time).
    est_s = kv_bytes / 700e9
    hi = max(200, int(60e-3 / est_s))
    lo = hi // 10

    def one_fit():
        return (run(hi) - run(lo)) / (hi - lo)

    fits = [one_fit(), one_fit()]
    if max(fits) / min(fits) > 1.10:
        # Disagreeing fits: take a third and use the median (the round-4
        # fp8qk-outlier rule, automated).
        fits.append(one_fit())
        fits.sort()
        t = fits[1]
    else:
        t = max(fits)  # conservative: slower fit -> lower claimed GB/s
    gbps = kv_bytes / t / 1e9
    pct = 100 * gbps / hbm_gbps if hbm_gbps else None
    suspect = (max(fits) / min(fits) > 1.25) or (
        pct is not None and pct > 102.0
    )
    return {
        "name": name,
        "ms": round(t * 1e3, 4),
        "ms_fits": [round(x * 1e3, 4) for x in fits],
        "decode_tokens_per_s": round(B / t, 1),
        "hbm_read_gbps": round(gbps, 1),
        "pct_of_measured_hbm": round(pct, 1) if pct is not None else None,
        "pct_of_datasheet": round(100 * gbps / V5E_HBM_DATASHEET_GBPS, 1),
        "pool_mb": round(2 * (kp.nbytes + ks.nbytes) / 1e6),
        "pages_scattered": True,
        "suspect": suspect,
    }


def _training_row():
    """fwd+bwd through the Pallas flash kernels (VERDICT r3 #7): the
    training-path counterpart of the headline prefill row."""
    from photonic_flash_attention_tpu.ops.flash import flash_attention

    B, S, H, D = 4, 2048, 12, 64
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)

    def loss(q, k, v):
        o = flash_attention(q, k, v, causal=True, block_q=512, block_kv=512)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def fn(c, k, v):
        dq, dk, dv = grad(c, k, v)
        return (c + dq.astype(c.dtype) * jnp.bfloat16(1e-6)).astype(c.dtype)

    t = _bench(fn, q, k, v, iters=(10, 50))
    # fwd 4*B*H*S^2*D*0.5 causal + bwd ~2.5x fwd (dq,dk,dv + recompute)
    fl = 4 * B * H * S * S * D * 0.5 * 3.5
    return {
        "name": "train_fwd_bwd_b4_s2048",
        "ms": round(t * 1e3, 4),
        "tflops": round(fl / t / 1e12, 1),
        "note": (
            "flash fwd + bwd via the round-5 unrolled kernels "
            "(bf16 square in-envelope path), flops = 3.5x fwd model"
        ),
    }


def _training_row_d128():
    """Llama-geometry (GQA, D=128) training row — driver-visible since
    round 5 (round 4 tracked it only in a hand-run artifact at 131.5
    TFLOP/s)."""
    from photonic_flash_attention_tpu.ops.flash import flash_attention

    B, S, Hq, Hkv, D = 2, 4096, 32, 8, 128
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.bfloat16)

    def loss(q, k, v):
        o = flash_attention(q, k, v, causal=True, block_q=512, block_kv=512)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def fn(c, k, v):
        dq, dk, dv = grad(c, k, v)
        return (c + dq.astype(c.dtype) * jnp.bfloat16(1e-6)).astype(c.dtype)

    t = _bench(fn, q, k, v, iters=(5, 30))
    fl = 4 * B * Hq * S * S * D * 0.5 * 3.5
    return {
        "name": "train_fwd_bwd_b2_s4096_d128gqa",
        "ms": round(t * 1e3, 4),
        "tflops": round(fl / t / 1e12, 1),
        "note": "GQA 32/8 D=128 fwd+bwd via unrolled kernels, 3.5x fwd model",
    }


def _serving_row():
    """GPT-2-medium continuous batching, STEADY STATE (VERDICT r4 #2).

    Round 4 timed one cold ``generate`` — 5.07 s of wall that was mostly
    jit compile, reported as "303 tokens/s". This row warms the engine
    (one full generate compiles prefill + every window program), resets
    the counters, then times a second pass; and it sweeps the decode
    window (8/32/128) so host-dispatch overhead is decomposed from
    device step time by a linear fit of window wall vs window length
    (slope = device+per-step cost, intercept = per-window host RTT,
    ~24 ms through the tunneled runtime).
    """
    from photonic_flash_attention_tpu.core.serving import ServingEngine
    from photonic_flash_attention_tpu.models.gpt2 import GPT2Config, GPT2LMHead

    cfg = GPT2Config.medium()
    model = GPT2LMHead(cfg)
    rng = np.random.default_rng(4)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
    )
    eng = ServingEngine(
        cfg,
        variables["params"],
        num_pages=256,
        page_size=128,
        max_batch=8,
        kv_dtype=jnp.int8,
        decode_window=128,
    )
    n_new = 129  # budget 128 after the prefill-boundary token: clean pow2
    n_prompt, batch = 128, 8

    def one_pass():
        prompts = [
            list(rng.integers(1, cfg.vocab_size, n_prompt))
            for _ in range(batch)
        ]
        t0 = time.perf_counter()
        eng.generate(prompts, max_new_tokens=n_new)
        return time.perf_counter() - t0

    sweep = []
    cold_wall = None
    for window in (8, 32, 128):
        eng.decode_window = window
        warm_wall = one_pass()  # compiles this window size on first use
        if cold_wall is None:
            cold_wall = warm_wall
        eng.reset_performance_stats()
        wall = one_pass()
        stats = eng.get_performance_stats()
        sweep.append(
            {
                "window": window,
                "tokens_per_s": round(batch * (n_prompt + n_new) / wall, 1),
                "decode_tokens_per_s": round(
                    stats["decode_tokens"] / max(stats["decode_time"], 1e-9), 1
                )
                if "decode_time" in stats
                else round(stats.get("decode_tokens_per_s", 0.0), 1),
                "decode_ms_per_token": round(
                    1e3
                    * stats.get("decode_time", 0.0)
                    / max(stats.get("decode_tokens", 1), 1),
                    3,
                ),
                "wall_s": round(wall, 3),
            }
        )

    # Host/device decomposition: per-window wall = intercept (host RTT)
    # + steps * ms_per_step. Two-point fit from the extreme windows.
    lo, hi = sweep[0], sweep[-1]
    # per-token totals at each window (ms):
    tot_lo = lo["decode_ms_per_token"]
    tot_hi = hi["decode_ms_per_token"]
    # t(w) = host/w /B + dev  => dev ~ extrapolation to infinite window
    inv_lo, inv_hi = 1.0 / lo["window"], 1.0 / hi["window"]
    slope = (tot_lo - tot_hi) / (inv_lo - inv_hi)  # host ms per window / B
    dev_ms_per_token = tot_hi - slope * inv_hi
    host_ms_per_window = slope * 8  # B sequences share one window

    best = max(sweep, key=lambda r: r["tokens_per_s"])
    return {
        "name": "serving_gpt2_medium_int8kv_b8_steady",
        "tokens_per_s": best["tokens_per_s"],
        "best_window": best["window"],
        "device_ms_per_decode_token": round(max(dev_ms_per_token, 0.0), 3),
        "host_ms_per_window": round(max(host_ms_per_window, 0.0), 1),
        "window_sweep": sweep,
        "cold_wall_s": round(cold_wall, 2),
        "note": (
            f"8x({n_prompt} prompt + {n_new} new), int8 KV, steady-state "
            "(warmed engine, compile excluded); cold_wall_s is the "
            "round-4-style number for comparison"
        ),
    }


def main() -> None:
    from photonic_flash_attention_tpu.ops.flash import flash_attention
    from photonic_flash_attention_tpu.ops.flash_fp8 import (
        flash_attention_fp8qk,
        flash_attention_int8full,
        flash_attention_int8qk,
    )
    from photonic_flash_attention_tpu.ops.reference import attention_reference
    from photonic_flash_attention_tpu.optimization.caching import (
        CompileCacheManager,
    )

    # Persistent XLA compile cache: repeated driver runs skip recompiles
    # (remote compile latency through tunneled runtimes is large/variable).
    try:
        CompileCacheManager().enable()
    except Exception:
        pass

    B, S, H, D = 4, 2048, 12, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    flops_headline = 4 * B * H * S * S * D * 0.5  # causal

    # Measured VPU softmax-stream cost model (VERDICT r4 #3;
    # ops/device_probes.py): t_tile = a + b*elems. The composite ceiling
    # uses the asymptotic rate 1/b; (a, b) also feeds the serial
    # no-overlap model documented in docs/kernels.md.
    try:
        from photonic_flash_attention_tpu.ops.device_probes import (
            measure_softmax_linear,
        )

        vpu_model = measure_softmax_linear()
        vpu_rate = vpu_model["asymptotic_elems_per_s"]
        print(
            f"vpu softmax stream: {vpu_rate/1e9:.0f} Gelem/s asymptotic, "
            f"{vpu_model['fixed_s_per_tile']*1e9:.0f} ns/tile fixed",
            file=sys.stderr, flush=True,
        )
    except Exception as e:  # pragma: no cover
        print(f"vpu probe failed: {e}", file=sys.stderr, flush=True)
        vpu_model, vpu_rate = None, None

    from photonic_flash_attention_tpu.hardware.roofline import (
        attention_composite_ceiling,
    )

    def pct_composite(t_s, b_, s_, h_, hkv_, d_, causal_, dtype_):
        score_pv = {
            "bf16": ("bf16", "bf16"),
            "int8qk": ("int8", "bf16"),
            "int8": ("int8", "int8"),
            "fp8": ("bf16", "bf16"),  # v5e has no native fp8 MXU path
        }[dtype_]
        ceil = attention_composite_ceiling(
            b_, s_, s_, h_, d_, causal=causal_,
            score_dtype=score_pv[0], pv_dtype=score_pv[1],
            num_kv_heads=hkv_,
            rates={"vpu_softmax_elems_per_s": vpu_rate},
        )
        return round(100 * ceil["t_ceiling_us"] / (t_s * 1e6), 1), ceil["bound"]

    # Baseline: XLA-fused naive attention.
    print("compiling baseline...", file=sys.stderr, flush=True)
    t_naive = _bench(
        lambda q, k, v: attention_reference(q, k, v, causal=True)[0], q, k, v
    )
    print(f"baseline {t_naive*1e3:.3f} ms", file=sys.stderr, flush=True)

    # Flash kernel at the tuned default block sizes (512 x 512, measured
    # best on v5e by the same fit methodology — see ops/flash.py). Two
    # independent fit passes, min taken: the headline feeds the driver's
    # single-sample BENCH record and run-to-run noise through the
    # tunneled runtime is ~±5%.
    bq, bkv = 512, 512
    _flash_fn = lambda q, k, v: flash_attention(  # noqa: E731
        q, k, v, causal=True, block_q=bq, block_kv=bkv
    )
    t_flash = min(_bench(_flash_fn, q, k, v), _bench(_flash_fn, q, k, v))
    print(f"flash {t_flash*1e3:.3f} ms", file=sys.stderr, flush=True)
    eff_tflops = flops_headline / t_flash / 1e12

    pc, bound = pct_composite(t_flash, B, S, H, H, D, True, "bf16")
    rows = [
        {
            "name": "flash_bf16_causal_b4_s2048",
            "ms": round(t_flash * 1e3, 4),
            "tflops": round(eff_tflops, 1),
            "mfu_vs_ceiling": round(eff_tflops * 1e12 / CEILS[(64, "bf16")], 3),
            "pct_of_composite": pc,
            "composite_bound": bound,
        }
    ]

    def flash_d128(q, k, v):
        return flash_attention(q, k, v, causal=True, block_q=bq, block_kv=bkv)

    from photonic_flash_attention_tpu.ops.flash_unrolled import (
        flash_attention_unrolled,
    )

    extra = [
        # Round-5 unrolled-KV kernels (ops/flash_unrolled.py): VPU/MXU
        # overlap via straight-line kv bodies; triangular static-extent
        # calls for causal. Measured 1.29-1.49x the grid kernels.
        (
            "flash_unrolled_causal_b4_s2048",
            lambda q, k, v: flash_attention_unrolled(q, k, v, causal=True),
            "bf16",
            (B, S, H, H, D),
        ),
        (
            "flash_unrolled_causal_b1_s8192",
            lambda q, k, v: flash_attention_unrolled(q, k, v, causal=True),
            "bf16",
            (1, 8192, 12, 12, 64),
        ),
        (
            "flash_unrolled_causal_b4_s4096_d128gqa",
            lambda q, k, v: flash_attention_unrolled(q, k, v, causal=True),
            "bf16",
            (4, 4096, 32, 8, 128),
        ),
        (
            "flash_unrolled_noncausal_b4_s4096_d128gqa",
            lambda q, k, v: flash_attention_unrolled(q, k, v, causal=False),
            "bf16",
            (4, 4096, 32, 8, 128),
        ),
        (
            "flash_unrolled_i8qk_noncausal_b4_s4096_d128gqa",
            lambda q, k, v: flash_attention_unrolled(
                q, k, v, causal=False, int8_qk=True
            ),
            "int8qk",
            (4, 4096, 32, 8, 128),
        ),
        ("flash_bf16_causal_b1_s8192", flash_d128, "bf16", (1, 8192, 12, 12, 64)),
        (
            "flash_int8qk_causal_b4_s2048",
            lambda q, k, v: flash_attention_int8qk(
                q, k, v, causal=True, block_q=bq, block_kv=bkv
            ),
            "int8qk",
            (B, S, H, H, D),
        ),
        (
            "flash_int8qk_causal_b1_s8192",
            lambda q, k, v: flash_attention_int8qk(
                q, k, v, causal=True, block_q=bq, block_kv=bkv
            ),
            "int8qk",
            (1, 8192, 12, 12, 64),
        ),
        (
            "flash_int8full_causal_b1_s8192",
            lambda q, k, v: flash_attention_int8full(
                q, k, v, causal=True, block_q=bq, block_kv=bkv
            ),
            "int8",
            (1, 8192, 12, 12, 64),
        ),
        (
            "flash_fp8qk_causal_b4_s2048",
            lambda q, k, v: flash_attention_fp8qk(
                q, k, v, causal=True, block_q=bq, block_kv=bkv
            ),
            "fp8",
            (B, S, H, H, D),
        ),
        # D=128 Llama geometry (GQA 32/8): full MXU width (VERDICT r3 #3)
        ("flash_bf16_causal_b4_s4096_d128gqa", flash_d128, "bf16",
         (4, 4096, 32, 8, 128)),
        (
            # No explicit blocks: the kernel's D-aware default picks
            # 1024x1024 at D>=128 (measured +4-8% over 512x512,
            # benchmarks/flash_d128_sweep.py).
            "flash_int8qk_causal_b4_s4096_d128gqa",
            lambda q, k, v: flash_attention_int8qk(q, k, v, causal=True),
            "int8qk",
            (4, 4096, 32, 8, 128),
        ),
        (
            "flash_fp8qk_causal_b4_s4096_d128gqa",
            lambda q, k, v: flash_attention_fp8qk(
                q, k, v, causal=True, block_q=bq, block_kv=bkv
            ),
            "fp8",
            (4, 4096, 32, 8, 128),
        ),
        (
            # Best-MFU geometry in the registry: non-causal D=128 at the
            # sweep-best 1024x512 tiles (152.4 TFLOP/s = 77% of the 197
            # bf16 ceiling, benchmarks/flash_d128_sweep.py).
            "flash_int8qk_noncausal_b4_s4096_d128gqa",
            lambda q, k, v: flash_attention_int8qk(
                q, k, v, causal=False, block_q=1024, block_kv=512
            ),
            "int8qk",
            (4, 4096, 32, 8, 128),
        ),
    ]
    for name, fn, dtype, (b_, s_, h_, hkv_, d_) in extra:
        try:
            qq = jnp.asarray(
                rng.standard_normal((b_, s_, h_, d_)), jnp.bfloat16
            )
            kk = jnp.asarray(
                rng.standard_normal((b_, s_, hkv_, d_)), jnp.bfloat16
            )
            vv = jnp.asarray(
                rng.standard_normal((b_, s_, hkv_, d_)), jnp.bfloat16
            )
            t = _bench(fn, qq, kk, vv)
            causal_ = "noncausal" not in name
            frac = 0.5 if causal_ else 1.0
            fl = 4 * b_ * h_ * s_ * s_ * d_ * frac
            ceil = CEILS[(d_, dtype)]
            pc, bound = pct_composite(t, b_, s_, h_, hkv_, d_, causal_, dtype)
            rows.append(
                {
                    "name": name,
                    "ms": round(t * 1e3, 4),
                    "tflops": round(fl / t / 1e12, 1),
                    "mfu_vs_ceiling": round(fl / t / ceil, 3),
                    "pct_of_composite": pc,
                    "composite_bound": bound,
                }
            )
            print(f"{name} {t*1e3:.3f} ms", file=sys.stderr, flush=True)
        except Exception as e:  # pragma: no cover - row must not kill bench
            print(f"{name} failed: {e}", file=sys.stderr, flush=True)

    # Long-context rows (VERDICT r4 #5): the S=64K north-star config,
    # full-causal and sliding-window, driver-visible so regressions show
    # up in BENCH_r*.json instead of only hand-run artifacts.
    try:
        b_, s_, h_, d_ = 1, 65536, 4, 64
        q64 = jnp.asarray(
            np.random.default_rng(7).standard_normal((b_, s_, h_, d_)),
            jnp.bfloat16,
        )
        k64 = jnp.asarray(
            np.random.default_rng(8).standard_normal((b_, s_, h_, d_)),
            jnp.bfloat16,
        )
        v64 = jnp.asarray(
            np.random.default_rng(9).standard_normal((b_, s_, h_, d_)),
            jnp.bfloat16,
        )
        t64 = _bench(
            lambda q, k, v: flash_attention(q, k, v, causal=True),
            q64, k64, v64, iters=(4, 24),
        )
        fl64 = 4 * b_ * h_ * s_ * s_ * d_ * 0.5
        pc, bound = pct_composite(t64, b_, s_, h_, h_, d_, True, "bf16")
        rows.append(
            {
                "name": "flash_bf16_causal_b1_s65536",
                "ms": round(t64 * 1e3, 3),
                "tflops": round(fl64 / t64 / 1e12, 1),
                "tokens_per_s": round(b_ * s_ / t64, 1),
                "pct_of_composite": pc,
                "composite_bound": bound,
            }
        )
        print(f"64K full {t64*1e3:.1f} ms", file=sys.stderr, flush=True)
        win = 4096
        tw = _bench(
            lambda q, k, v: flash_attention(
                # rel = col - row in [lo, hi]: Mistral-style local window
                q, k, v, causal=True, window=(-(win - 1), 0)
            ),
            q64, k64, v64, iters=(10, 60),
        )
        # Window flops: each query attends to <= `win`+1 past keys.
        flw = 4 * b_ * h_ * s_ * win * d_
        rows.append(
            {
                "name": f"flash_bf16_causal_window{win}_b1_s65536",
                "ms": round(tw * 1e3, 3),
                "tflops": round(flw / tw / 1e12, 1),
                "tokens_per_s": round(b_ * s_ / tw, 1),
                "speedup_vs_full": round(t64 / tw, 2),
            }
        )
        print(f"64K window {tw*1e3:.1f} ms", file=sys.stderr, flush=True)
        del q64, k64, v64
    except Exception as e:  # pragma: no cover
        print(f"64K rows failed: {e}", file=sys.stderr, flush=True)

    # Dense 2-D bias flash row vs the fused path (VERDICT r4 #5): the
    # round-4 attn_bias tile stream, regression-tracked.
    try:
        from photonic_flash_attention_tpu.ops.fused import fused_attention

        bias = jnp.asarray(
            np.random.default_rng(10).standard_normal((B, 1, S, S)) * 0.1,
            jnp.float32,
        )

        def flash_bias(qq, kk, vv):
            return flash_attention(
                qq, kk, vv, causal=True, block_q=bq, block_kv=bkv,
                attn_bias=bias,
            )

        t_fb = _bench(flash_bias, q, k, v)

        def fused_bias(qq, kk, vv):
            out, _ = fused_attention(qq, kk, vv, causal=True, bias=bias)
            return out

        t_fu = _bench(fused_bias, q, k, v, iters=(10, 60))
        rows.append(
            {
                "name": "flash_bf16_causal_dense_bias_b4_s2048",
                "ms": round(t_fb * 1e3, 4),
                "tflops": round(flops_headline / t_fb / 1e12, 1),
                "fused_ms": round(t_fu * 1e3, 4),
                "speedup_vs_fused": round(t_fu / t_fb, 2),
            }
        )
        print(
            f"dense-bias flash {t_fb*1e3:.3f} ms vs fused {t_fu*1e3:.3f} ms",
            file=sys.stderr, flush=True,
        )
    except Exception as e:  # pragma: no cover
        print(f"dense-bias row failed: {e}", file=sys.stderr, flush=True)

    try:
        hbm_gbps = _calibrate_hbm_read_gbps()
        print(f"hbm read {hbm_gbps:.0f} GB/s", file=sys.stderr, flush=True)
    except Exception as e:  # pragma: no cover
        print(f"hbm calibration failed: {e}", file=sys.stderr, flush=True)
        hbm_gbps = None

    for dname, geo in [
        ("paged_decode_int8_b8_kv2048", (8, 12, 12, 64, 2048, 128)),
        ("paged_decode_int8_b32_kv2048_d64", (32, 12, 12, 64, 2048, 128)),
        ("paged_decode_int8_b16_kv4096_gqa_d128", (16, 32, 8, 128, 4096, 128)),
    ]:
        try:
            rows.append(_decode_row(dname, *geo, hbm_gbps))
            print(f"{dname} done", file=sys.stderr, flush=True)
        except Exception as e:  # pragma: no cover
            print(f"{dname} failed: {e}", file=sys.stderr, flush=True)

    try:
        rows.append(_training_row())
        print("training row done", file=sys.stderr, flush=True)
    except Exception as e:  # pragma: no cover
        print(f"training row failed: {e}", file=sys.stderr, flush=True)

    try:
        rows.append(_training_row_d128())
        print("training d128 row done", file=sys.stderr, flush=True)
    except Exception as e:  # pragma: no cover
        print(f"training d128 row failed: {e}", file=sys.stderr, flush=True)

    try:
        rows.append(_serving_row())
        print("serving row done", file=sys.stderr, flush=True)
    except Exception as e:  # pragma: no cover
        print(f"serving row failed: {e}", file=sys.stderr, flush=True)

    try:
        xla_matmul_tflops = _calibrate_matmul_tflops()
    except Exception:
        xla_matmul_tflops = None

    # Headline = router-dispatched best at the reference geometry: the
    # engine's measured router arbitrates bf16 vs int8-QK per bucket
    # (both sit inside the reference's 0.1 accuracy gate, int8-QK at
    # ~1.3e-2 rel err), so the honest headline is whichever the router
    # would serve. The two trade the lead within run noise at this
    # causal-bound D=64 geometry.
    headline_kernel = "flash_bf16"
    headline_ceil = CEILS[(64, "bf16")]
    for r in rows:
        if r.get("name") == "flash_unrolled_causal_b4_s2048":
            t_un = r["ms"] / 1e3
            if t_un < t_flash:
                # Confirmation pass (same rule as the int8qk challenger).
                t_un = min(
                    t_un,
                    _bench(
                        lambda q, k, v: flash_attention_unrolled(
                            q, k, v, causal=True
                        ),
                        q, k, v,
                    ),
                )
                if t_un < t_flash:
                    t_flash = t_un
                    eff_tflops = flops_headline / t_flash / 1e12
                    headline_kernel = "flash_unrolled"
                    headline_ceil = CEILS[(64, "bf16")]
        if r.get("name") == "flash_int8qk_causal_b4_s2048":
            t_qk = r["ms"] / 1e3
            if t_qk < t_flash:
                # Confirmation pass before the lead changes hands: the
                # bf16 headline is a min-of-two, so the challenger must
                # also win as a min-of-two (ADVICE r4 #3; the round-4
                # fp8qk outlier lesson).
                t_qk = min(
                    t_qk,
                    _bench(
                        lambda q, k, v: flash_attention_int8qk(
                            q, k, v, causal=True, block_q=bq, block_kv=bkv
                        ),
                        q, k, v,
                    ),
                )
                if t_qk < t_flash:
                    t_flash = t_qk
                    eff_tflops = flops_headline / t_flash / 1e12
                    headline_kernel = "flash_int8qk"
                    headline_ceil = CEILS[(64, "int8qk")]

    tokens_per_s = B * S / t_flash
    print(
        json.dumps(
            {
                "metric": "flash_attention_prefill_tokens_per_sec_per_chip",
                "value": round(tokens_per_s, 1),
                "unit": "tokens/s",
                "vs_baseline": round(t_naive / t_flash, 3),
                "mfu": round(eff_tflops * 1e12 / headline_ceil, 3),
                "detail": {
                    "shape": {"batch": B, "seq": S, "heads": H, "head_dim": D},
                    "headline_kernel": headline_kernel,
                    "flash_ms": round(t_flash * 1e3, 3),
                    "xla_naive_ms": round(t_naive * 1e3, 3),
                    "effective_tflops": round(eff_tflops, 1),
                    "roofline": {
                        "model_d64_bf16_tflops": CEILS[(64, "bf16")] / 1e12,
                        "model_d64_int8_tflops": CEILS[(64, "int8")] / 1e12,
                        "model_d128_bf16_tflops": CEILS[(128, "bf16")] / 1e12,
                        "measured_hbm_read_gbps": (
                            round(hbm_gbps, 1) if hbm_gbps else None
                        ),
                        "hbm_datasheet_gbps": V5E_HBM_DATASHEET_GBPS,
                        "measured_vpu_softmax_gelems_per_s": (
                            round(vpu_rate / 1e9, 1) if vpu_rate else None
                        ),
                        "vpu_softmax_fixed_ns_per_tile": (
                            round(vpu_model["fixed_s_per_tile"] * 1e9, 1)
                            if vpu_model
                            else None
                        ),
                        "measured_xla_matmul_tflops": (
                            round(xla_matmul_tflops, 1)
                            if xla_matmul_tflops
                            else None
                        ),
                        "mfu_vs_xla_matmul": (
                            round(eff_tflops / xla_matmul_tflops, 3)
                            if xla_matmul_tflops
                            else None
                        ),
                    },
                    "rows": rows,
                    "block_q": bq,
                    "block_kv": bkv,
                    "dtype": "bfloat16",
                    "causal": True,
                    "backend": jax.default_backend(),
                    "timing": "lax.scan-chained, dispatch-overhead-free linear fit",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
