#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

Metric: flash-attention causal prefill throughput (tokens/s) on one chip
at the reference's benchmark geometry (d=768, h=12 — reference
cli.py:24-35 grid; S=2048 is its long-seq regime where the README claims
4.9-9.9x speedups, README.md:659-661).

``vs_baseline``: speedup over XLA-fused naive attention on the SAME chip
— the honest analogue of the reference's photonic-vs-GPU ratio (their
"GPU baseline" was their own standard path).

Timing methodology: the iteration loop runs INSIDE one jitted
``lax.scan`` (output chained into the next call so nothing is
dead-code-eliminated), and per-iteration time is the slope of a linear
fit across two iteration counts. This cancels the fixed host->device
dispatch + fetch round-trip, which through tunneled remote runtimes is
~24 ms per call — 12x the kernel itself at this geometry — and which a
production serving loop amortizes by pipelining. ``block_until_ready``
is additionally unreliable here (observed to return before execution
completes), so completion is forced by fetching a scalar reduction.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS_LO, ITERS_HI = 20, 120


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


def _bench(fn, q, k, v):
    """Per-iteration device time via linear fit over iteration counts."""
    t_lo = _timed(fn, q, k, v, ITERS_LO)
    t_hi = _timed(fn, q, k, v, ITERS_HI)
    return (t_hi - t_lo) / (ITERS_HI - ITERS_LO)


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
    t_naive = _bench(
        lambda q, k, v: attention_reference(q, k, v, causal=True)[0], q, k, v
    )
    print(f"baseline {t_naive*1e3:.3f} ms", file=sys.stderr, flush=True)

    # Flash kernel at the tuned default block sizes (512 x 512, measured
    # best on v5e by the same fit methodology after the lane-replicated
    # running-stats rewrite — see ops/flash.py).
    bq, bkv = 512, 512
    t_flash = _bench(
        lambda q, k, v: flash_attention(
            q, k, v, causal=True, block_q=bq, block_kv=bkv
        ),
        q,
        k,
        v,
    )
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
                    "timing": "lax.scan-chained, dispatch-overhead-free linear fit",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
