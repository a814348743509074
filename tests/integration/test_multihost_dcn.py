"""Multi-host (DCN) execution test — 2 real OS processes (VERDICT r3 #8).

The reference *names* distributed backends and never initializes them
(reference scaling/distributed_computing.py:98-99; ``init_process_group``
is never called). The mandate is to make them real: this test spawns two
actual processes, runs ``jax.distributed.initialize`` against a local
coordinator, builds a DCN-major ``pod_mesh`` spanning both processes
(4 virtual CPU devices each -> 8 global), and executes one psum whose
result proves bytes crossed the process boundary.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    port, pid, repo = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("JAX_PLATFORMS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2,
        process_id=pid,
    )
    sys.path.insert(0, repo)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from photonic_flash_attention_tpu.parallel.multihost import (
        initialize_multihost, pod_mesh, process_summary,
    )

    info = initialize_multihost()  # must be a no-op when already up
    assert info["process_count"] == 2 and info["global_devices"] == 8, info
    mesh = pod_mesh((2, 4), ("data", "model"), dcn_axis="data")
    # the dcn axis must stride processes: each data-row lives on one proc
    procs_per_row = [
        len({d.process_index for d in row}) for row in mesh.devices
    ]
    assert procs_per_row == [1, 1], procs_per_row
    assert (
        mesh.devices[0][0].process_index != mesh.devices[1][0].process_index
    )
    sharding = NamedSharding(mesh, P("data", "model"))
    x = jax.make_array_from_callback(
        (8, 4), sharding, lambda idx: np.ones((8, 4), np.float32)[idx]
    )
    f = jax.jit(jax.shard_map(
        lambda a: jax.lax.psum(jnp.sum(a), ("data", "model")),
        mesh=mesh, in_specs=P("data", "model"), out_specs=P(),
    ))
    y = f(x)
    print("PSUM_OK", float(y), process_summary()["process_index"], flush=True)

    # Ring attention ACROSS the process boundary: an 8-way seq ring whose
    # ppermute hops cross DCN (4 devices per process). Every process
    # builds identical inputs from a fixed seed; the distributed result
    # must match the locally-computed oracle.
    from photonic_flash_attention_tpu.ops.reference import attention_reference
    from photonic_flash_attention_tpu.parallel.ring import make_ring_attention

    seq_mesh = pod_mesh((8,), ("seq",), dcn_axis="seq")
    rng = np.random.default_rng(7)
    B, S, H, D = 1, 1024, 2, 64
    qkv_np = [rng.standard_normal((B, S, H, D)).astype(np.float32) for _ in range(3)]
    qspec = NamedSharding(seq_mesh, P(None, "seq", None, None))
    q, k, v = (
        jax.make_array_from_callback(a.shape, qspec, lambda idx, a=a: a[idx])
        for a in qkv_np
    )
    ring = make_ring_attention(seq_mesh, data_axis=None, model_axis=None, causal=True)
    out = ring(q, k, v)
    ref, _ = attention_reference(*(jnp.asarray(a) for a in qkv_np), causal=True)
    err = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert err < 2e-3, err
    # padded batch over the cross-process ring (global kv_lens)
    lens = jnp.array([700], jnp.int32)
    out_p = ring(q, k, v, kv_lens=lens)
    keep = jnp.arange(S, dtype=jnp.int32)[None] < lens[:, None]
    ref_p, _ = attention_reference(
        *(jnp.asarray(a) for a in qkv_np), keep[:, None, None, :], causal=True
    )
    err_p = float(jnp.linalg.norm(out_p - ref_p) / jnp.linalg.norm(ref_p))
    assert err_p < 2e-3, err_p
    print(f"RING_OK {err:.5f} {err_p:.5f}", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_dcn_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    worker = tmp_path / "dcn_worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(i), repo],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out[-2000:]}"
        assert "PSUM_OK 32.0" in out, out[-2000:]
        assert "RING_OK" in out, out[-2000:]
