#!/usr/bin/env python
"""Round-4 prefill kernel sweep: bf16 vs int8qk vs int8full vs fp8qk vs
fp8(block-scale), at D=64 and D=128 geometries."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


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
    from photonic_flash_attention_tpu.ops.flash_fp8 import (
        flash_attention_fp8qk,
        flash_attention_int8full,
        flash_attention_int8qk,
    )

    try:
        CompileCacheManager().enable()
    except Exception:
        pass
    print("backend:", jax.default_backend(), flush=True)

    KERNELS = {
        "bf16": lambda q, k, v, bq, bkv: flash_attention(
            q, k, v, causal=True, block_q=bq, block_kv=bkv
        ),
        "int8qk": lambda q, k, v, bq, bkv: flash_attention_int8qk(
            q, k, v, causal=True, block_q=bq, block_kv=bkv
        ),
        "int8full": lambda q, k, v, bq, bkv: flash_attention_int8full(
            q, k, v, causal=True, block_q=bq, block_kv=bkv
        ),
        "fp8qk": lambda q, k, v, bq, bkv: flash_attention_fp8qk(
            q, k, v, causal=True, block_q=bq, block_kv=bkv
        ),
    }
    # (name, B, S, H, Hkv, D, blocks)
    geos = [
        ("b4_s2048_h12_d64", 4, 2048, 12, 12, 64, (512, 512)),
        ("b1_s8192_h12_d64", 1, 8192, 12, 12, 64, (512, 512)),
        ("b4_s4096_h8gqa32_d128", 4, 4096, 32, 8, 128, (512, 512)),
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else None
    rng = np.random.default_rng(0)
    for gname, B, S, H, Hkv, D, (bq, bkv) in geos:
        q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.bfloat16)
        fl = 4 * B * H * S * S * D * 0.5
        for kname, fn in KERNELS.items():
            if only and only not in f"{gname}:{kname}":
                continue
            try:
                t = bench(functools.partial(fn, bq=bq, bkv=bkv)
                          if False else (lambda q_, k_, v_, f=fn: f(q_, k_, v_, bq, bkv)),
                          q, k, v)
                print(
                    f"{gname:24s} {kname:9s} {t*1e3:7.3f} ms  "
                    f"{fl/t/1e12:6.1f} TFLOP/s",
                    flush=True,
                )
            except Exception as e:
                print(f"{gname} {kname} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
