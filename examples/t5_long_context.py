#!/usr/bin/env python
"""T5 at long sequence lengths — the configuration the reference claims
as its biggest win (T5-Large seq 8192, 19.56x, reference README.md:663)
but whose dense path cannot actually run (a materialized relative-
position bias alone is ~4 GB).

Here the bias is rebuilt from iota INSIDE the Pallas flash kernel
(ops/rel_bias.py), so the encoder runs at 8K+ with O(S) memory.
"""

import time

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from photonic_flash_attention_tpu.ops import (
    T5RelBias,
    flash_attention,
    materialize,
)
from photonic_flash_attention_tpu.ops.reference import attention_reference


def main() -> None:
    B, S, H, D = 1, 8192, 16, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    table = jnp.asarray(rng.standard_normal((32, H)) * 0.5, jnp.float32)
    spec = T5RelBias(table=table, bidirectional=True)  # encoder self-attn

    fn = jax.jit(
        lambda q, k, v: flash_attention(q, k, v, sm_scale=1.0, rel_bias=spec)
    )
    out = fn(q, k, v)
    t0 = time.perf_counter()
    out = fn(q, k, v)
    float(jnp.sum(out.astype(jnp.float32)))  # force completion
    dt = time.perf_counter() - t0
    print(f"T5 encoder self-attention, S={S}: {dt*1e3:.1f} ms (incl. dispatch)")
    print(f"dense bias would need {H * S * S * 4 / 2**30:.1f} GiB; kernel uses "
          f"{table.size * 4 / 1024:.1f} KiB of table")

    # Exactness at a verifiable size:
    s_small = 512
    dense = materialize(spec, s_small, s_small)
    ref, _ = attention_reference(
        q[:, :s_small].astype(jnp.float32),
        k[:, :s_small].astype(jnp.float32),
        v[:, :s_small].astype(jnp.float32),
        bias=dense, sm_scale=1.0,
    )
    got = flash_attention(
        q[:, :s_small], k[:, :s_small], v[:, :s_small], sm_scale=1.0, rel_bias=spec
    )
    err = float(
        jnp.linalg.norm(got.astype(jnp.float32) - ref) / jnp.linalg.norm(ref)
    )
    print(f"rel-err vs dense oracle at S={s_small}: {err:.2e}")


if __name__ == "__main__":
    main()
