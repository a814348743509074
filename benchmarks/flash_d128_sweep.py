"""Block-size sweep for the flash kernel at D=128 (full MXU width).

Round-4 finding: the D=64 headline geometry is VPU(exp)-bound, but at
D=128 (Llama GQA geometry) the MXU work per score element doubles and
the kernel still measured only ~50-56% MFU with the default 512x512
blocks — tuning headroom the D=64-centric autotuner sweeps never
explored. This harness measures bf16 / int8-QK / fp8-QK across block
shapes at the D=128 GQA geometries and prints a ranked table.

Run on the real TPU: ``python benchmarks/flash_d128_sweep.py``.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from photonic_flash_attention_tpu.ops.flash import flash_attention  # noqa: E402
from photonic_flash_attention_tpu.ops.flash_fp8 import (  # noqa: E402
    flash_attention_fp8qk,
    flash_attention_int8qk,
)

ITERS = (8, 40)


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


def bench(fn, q, k, v):
    lo, hi = ITERS
    t_lo = _timed(fn, q, k, v, lo)
    t_hi = _timed(fn, q, k, v, hi)
    return (t_hi - t_lo) / (hi - lo)


def main():
    rng = np.random.default_rng(0)
    geoms = [
        ("b4_s4096_gqa32_8_d128", 4, 4096, 32, 8, 128, True),
        ("b1_s8192_gqa32_8_d128", 1, 8192, 32, 8, 128, True),
        ("b4_s4096_gqa32_8_d128_nc", 4, 4096, 32, 8, 128, False),
    ]
    blocks = [
        (256, 256), (256, 512), (512, 256), (512, 512),
        (512, 1024), (1024, 512), (256, 1024), (1024, 256),
        (768, 512), (512, 768), (1024, 1024),
    ]
    kernels = {
        "bf16": flash_attention,
        "int8qk": flash_attention_int8qk,
        "fp8qk": flash_attention_fp8qk,
    }
    for name, b, s, hq, hkv, d, causal in geoms:
        q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.bfloat16)
        frac = 0.5 if causal else 1.0
        flops = 4.0 * b * hq * s * s * d * frac
        print(f"== {name} ==", flush=True)
        rows = []
        for kname, kfn in kernels.items():
            for bq, bkv in blocks:
                fn = functools.partial(
                    kfn, causal=causal, block_q=bq, block_kv=bkv
                )
                try:
                    t = bench(fn, q, k, v)
                except Exception as e:  # noqa: BLE001 - infeasible tile
                    print(f"  {kname} {bq}x{bkv}: FAIL {type(e).__name__}",
                          flush=True)
                    continue
                tf = flops / t / 1e12
                rows.append((tf, kname, bq, bkv, t * 1e3))
                print(
                    f"  {kname} {bq}x{bkv}: {t*1e3:.3f} ms  {tf:.1f} TFLOP/s",
                    flush=True,
                )
        rows.sort(reverse=True)
        print("  -- top5 --")
        for tf, kname, bq, bkv, ms in rows[:5]:
            print(f"  {kname} {bq}x{bkv}: {ms:.3f} ms  {tf:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
