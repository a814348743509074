"""Ring + Ulysses sequence parallelism on a device mesh.

Works on real multi-chip hosts and on CPU with virtual devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python examples/distributed_ring.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from photonic_flash_attention_tpu.parallel.mesh import create_mesh
from photonic_flash_attention_tpu.parallel.ring import make_ring_attention
from photonic_flash_attention_tpu.parallel.telemetry import get_telemetry
from photonic_flash_attention_tpu.parallel.ulysses import make_ulysses_attention


def main() -> None:
    n = len(jax.devices())
    print(f"{n} device(s): {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    B, S, H, D = 1, 512 * n, 8, 64
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)

    mesh = create_mesh((n,), ("seq",))

    ring = make_ring_attention(mesh, data_axis=None, model_axis=None, causal=True)
    out_ring = ring(q, k, v)
    print(f"ring attention: {out_ring.shape} over seq axis of {n}")

    if H % n == 0:
        uly = make_ulysses_attention(mesh, data_axis=None, causal=True)
        out_uly = uly(q, k, v)
        err = float(
            jnp.linalg.norm((out_uly - out_ring).astype(jnp.float32))
            / jnp.linalg.norm(out_ring.astype(jnp.float32))
        )
        print(f"ulysses attention: rel err vs ring = {err:.2e}")

    # Padded batch: global valid key lengths ride the ring — each step
    # clips them to the resident shard, shards past every sequence's end
    # skip compute entirely.
    lens = jnp.array([S // 2 + 37], jnp.int32)
    out_padded = ring(q, k, v, kv_lens=lens)
    print(f"padded ring (kv_lens={int(lens[0])}/{S}): {out_padded.shape}")

    print("collective telemetry:", get_telemetry().get_stats())


if __name__ == "__main__":
    main()
