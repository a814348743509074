#!/usr/bin/env python
"""Decode-bandwidth experiment (round 4, VERDICT task 1).

Measures HBM copy bandwidth as the roofline, then sweeps the paged
decode kernels (round-3 per-head kernel vs round-4 head-folded kernel)
across geometries and block sizes, reporting achieved HBM read GB/s and
percent of the measured roofline.

KV pools are passed as jit ARGUMENTS (not closed over): captured arrays
embed as HLO constants and blow up the remote-compile request (HTTP 413
at a 537 MB pool) besides slowing every compile.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _timed_chain(fn, x, extras, iters, repeats=3):
    @functools.partial(jax.jit, static_argnums=2)
    def many(x, extras, n):
        def body(c, _):
            return fn(c, *extras), None

        out, _ = jax.lax.scan(body, x, None, length=n)
        # Sum the FULL carry: a sliced fetch lets XLA dead-code-eliminate
        # the untouched columns through the whole scan.
        return jnp.sum(out.astype(jnp.float32))

    float(many(x, extras, iters))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(many(x, extras, iters))
        best = min(best, time.perf_counter() - t0)
    return best


def bench(fn, x, extras=(), lo=10, hi=50):
    t_lo = _timed_chain(fn, x, extras, lo)
    t_hi = _timed_chain(fn, x, extras, hi)
    return (t_hi - t_lo) / (hi - lo)


def calibrate_hbm():
    """Measured HBM bandwidth from a Pallas grid copy (reads N, writes N
    => 2N bytes). A pure-XLA elementwise loop is NOT usable here: XLA
    elides/folds the chained scan body (measured 0.000 ms for a 256 MB
    stream); the opaque kernel can't be optimized away."""
    from photonic_flash_attention_tpu.ops.hbm_bw import hbm_copy

    n_bytes = 256 * 1024 * 1024
    x = jnp.ones((n_bytes // 2 // 512, 512), jnp.bfloat16)
    t = bench(hbm_copy, x, lo=10, hi=50)
    gbps = 2 * n_bytes / t / 1e9
    print(f"HBM copy calibration: {t*1e3:.3f} ms -> {gbps:.0f} GB/s", flush=True)
    return gbps


def decode_case(name, kernel, B, Hq, Hkv, D, S, page, hbm_gbps, **kw):
    from photonic_flash_attention_tpu.ops import paged

    pps = S // page
    num_pages = B * pps + 1
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    kp = jnp.asarray(rng.integers(-127, 127, (Hkv, num_pages, D, page)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 127, (Hkv, num_pages, D, page)), jnp.int8)
    ks = jnp.full((Hkv, num_pages, page), 0.05, jnp.float32)
    vs = jnp.full((Hkv, num_pages, page), 0.05, jnp.float32)
    lengths = jnp.full((B,), S, jnp.int32)
    page_indices = jnp.arange(B * pps, dtype=jnp.int32).reshape(B, pps) + 1

    fn = getattr(paged, kernel)

    def run(c, kp, vp, ks, vs, lengths, page_indices):
        return fn(c, kp, vp, lengths, page_indices, ks, vs, **kw)

    t = bench(run, q, (kp, vp, ks, vs, lengths, page_indices))
    kv_bytes = B * S * Hkv * D * 2 + B * S * Hkv * 4 * 2  # payload + scales
    gbps = kv_bytes / t / 1e9
    pct = 100 * gbps / hbm_gbps
    print(
        f"{name:55s} {t*1e3:7.3f} ms  {gbps:6.1f} GB/s  {pct:5.1f}% of HBM",
        flush=True,
    )
    return t, gbps


def main():
    from photonic_flash_attention_tpu.optimization.caching import (
        CompileCacheManager,
    )

    try:
        CompileCacheManager().enable()
    except Exception:
        pass
    print("backend:", jax.default_backend(), flush=True)
    hbm = calibrate_hbm()

    cases = [
        # float-compute + nbuf sweep at the serving geometry
        ("hf f32c nbuf3 B16 KV4096 Hq32 Hkv8 D128 ppb8", "paged_attention_hf",
         (16, 32, 8, 128, 4096, 128),
         dict(pages_per_block=8, num_buffers=3, int8_compute=False)),
        ("hf f32c nbuf4 B16 KV4096 Hq32 Hkv8 D128 ppb4", "paged_attention_hf",
         (16, 32, 8, 128, 4096, 128),
         dict(pages_per_block=4, num_buffers=4, int8_compute=False)),
        ("hf f32c nbuf2 B16 KV4096 Hq32 Hkv8 D128 ppb8", "paged_attention_hf",
         (16, 32, 8, 128, 4096, 128),
         dict(pages_per_block=8, num_buffers=2, int8_compute=False)),
        ("hf int8c nbuf3 B16 KV4096 Hq32 Hkv8 D128 ppb8", "paged_attention_hf",
         (16, 32, 8, 128, 4096, 128),
         dict(pages_per_block=8, num_buffers=3)),
        # GPT2-ish geometry at serving batch
        ("hf f32c nbuf3 B32 KV2048 H12 D64 ppb8", "paged_attention_hf",
         (32, 12, 12, 64, 2048, 128),
         dict(pages_per_block=8, num_buffers=3, int8_compute=False)),
        # Long context decode
        ("hf f32c nbuf3 B16 KV8192 Hq32 Hkv8 D128 ppb8", "paged_attention_hf",
         (16, 32, 8, 128, 8192, 128),
         dict(pages_per_block=8, num_buffers=3, int8_compute=False)),
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, kern, geo, kw in cases:
        if only and only not in name:
            continue
        try:
            decode_case(name, kern, *geo, hbm, **kw)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
