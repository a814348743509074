#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

Metric: flash-attention causal prefill throughput (tokens/s) on one chip
at the reference's benchmark geometry (d=768, h=12 — reference
cli.py:24-35 grid; S=2048 is its long-seq regime where the README claims
4.9-9.9x speedups, README.md:659-661).

``vs_baseline``: speedup over XLA-fused naive attention on the SAME chip
— the honest analogue of the reference's photonic-vs-GPU ratio (their
"GPU baseline" was their own standard path).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _bench(fn, args, iters=20):
    """Chained timing: each call's output feeds the next call's first arg,
    and the final result is fetched to host. Plain block_until_ready-based
    loops are unreliable through remote-dispatch TPU runtimes (observed to
    return before execution completes); the data dependency + host fetch
    force true end-to-end completion of every iteration."""
    q, *rest = args
    x = fn(q, *rest)
    float(jnp.sum(x))  # warmup compile + fetch path
    t0 = time.perf_counter()
    x = q
    for _ in range(iters):
        x = fn(x, *rest)
    float(jnp.sum(x))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import sys

    from photonic_flash_attention_tpu.ops.flash import flash_attention
    from photonic_flash_attention_tpu.ops.reference import attention_reference
    from photonic_flash_attention_tpu.optimization.caching import CompileCacheManager

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

    # Baseline: XLA-fused naive attention.
    print("compiling baseline...", file=sys.stderr, flush=True)
    naive = jax.jit(lambda q, k, v: attention_reference(q, k, v, causal=True)[0])
    t_naive = _bench(naive, (q, k, v))
    print(f"baseline {t_naive*1e3:.3f} ms", file=sys.stderr, flush=True)

    # Flash kernel at the tuned default block sizes (512 x 1024, measured
    # best on v5e — see ops/flash.py).
    bq, bkv = 512, 1024
    fn = jax.jit(
        lambda q, k, v: flash_attention(
            q, k, v, causal=True, block_q=bq, block_kv=bkv
        )
    )
    t_flash = _bench(fn, (q, k, v))
    print(f"flash {t_flash*1e3:.3f} ms", file=sys.stderr, flush=True)

    tokens_per_s = B * S / t_flash
    print(
        json.dumps(
            {
                "metric": "flash_attention_prefill_tokens_per_sec_per_chip",
                "value": round(tokens_per_s, 1),
                "unit": "tokens/s",
                "vs_baseline": round(t_naive / t_flash, 3),
                "detail": {
                    "shape": {"batch": B, "seq": S, "heads": H, "head_dim": D},
                    "flash_ms": round(t_flash * 1e3, 3),
                    "xla_naive_ms": round(t_naive * 1e3, 3),
                    "block_q": bq,
                    "block_kv": bkv,
                    "dtype": "bfloat16",
                    "causal": True,
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
