"""Ring attention — sequence-parallel context attention over a mesh axis.

The reference *names* sequence parallelism but never implements it
(reference README.md:431 ``partition_strategy='sequence_parallel'``; no
collective ever runs — SURVEY.md §2.5). This module is the real thing:

* K/V live sequence-sharded on a ``seq`` mesh axis; each step every
  device computes flash attention of its local Q shard against the KV
  block currently resident, then rotates KV to its ring neighbor with
  ``jax.lax.ppermute`` — point-to-point on ICI, overlapped by XLA with
  the next step's compute.
* Partial results merge by logsumexp (the cross-device form of the same
  online-softmax recurrence the reference's ``_tiled_attention`` runs
  within one device, core/flash_attention_3.py:207-260).
* Causal masking picks per-step between three bodies: full (KV block
  strictly in the past), diagonal (own block, causal flash), or skip
  (future block — no compute at all).

``ring_attention`` is the shard_map-internal primitive;
``make_ring_attention`` builds the jitted shard_map wrapper for a mesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.flash import flash_attention_with_lse


def softmax_merge(
    o1: jax.Array, lse1: jax.Array, o2: jax.Array, lse2: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Merge two partial attention results by logsumexp.

    o: (B, S, H, D); lse: (B, H, S). Fully-masked partials carry
    lse = -inf and zero output, so they are absorbed exactly.
    """
    m = jnp.maximum(lse1, lse2)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w1 = jnp.where(jnp.isfinite(lse1), jnp.exp(lse1 - m_safe), 0.0)
    w2 = jnp.where(jnp.isfinite(lse2), jnp.exp(lse2 - m_safe), 0.0)
    denom = w1 + w2
    denom_safe = jnp.where(denom == 0.0, 1.0, denom)
    # weights arrive as (B, H, S); outputs as (B, S, H, D)
    w1o = (w1 / denom_safe).transpose(0, 2, 1)[..., None]
    w2o = (w2 / denom_safe).transpose(0, 2, 1)[..., None]
    o = o1 * w1o + o2 * w2o
    lse = jnp.where(denom == 0.0, -jnp.inf, m_safe + jnp.log(denom_safe))
    return o, lse


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Ring attention body — call inside ``shard_map``.

    Args:
      q/k/v: LOCAL shards (B, S_local, H, D); the global sequence is the
        concatenation over the ``axis_name`` mesh axis, equal shards.
      causal: global causal masking (block-skip for future blocks).

    Returns the local output shard (B, S_local, H, D).
    """
    n = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)
    b, s_local, h, d = q.shape
    scale = sm_scale if sm_scale is not None else d ** -0.5

    flash = functools.partial(
        flash_attention_with_lse,
        sm_scale=scale,
        block_q=block_q,
        block_kv=block_kv,
        interpret=interpret,
    )

    def full_body(q, kb, vb):
        o, lse = flash(q, kb, vb, causal=False)
        return o.astype(jnp.float32), lse

    def diag_body(q, kb, vb):
        o, lse = flash(q, kb, vb, causal=True)
        return o.astype(jnp.float32), lse

    def skip_body(q, kb, vb):
        return (
            jnp.zeros(q.shape, jnp.float32),
            jnp.full((b, h, s_local), -jnp.inf, jnp.float32),
        )

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step_fn(step, carry):
        o, lse, kb, vb = carry
        src = jax.lax.rem(me - step + n, n)  # which shard this KV block is
        if causal:
            # 0: src < me (past, full) / 1: src == me (diagonal) /
            # 2: src > me (future, skip)
            idx = jnp.where(src == me, 1, jnp.where(src < me, 0, 2))
            o_i, lse_i = jax.lax.switch(
                idx, [full_body, diag_body, skip_body], q, kb, vb
            )
        else:
            o_i, lse_i = full_body(q, kb, vb)
        # Merge in fp32: the loop carry must keep one dtype, and fp32
        # accumulation across ring steps is the numerically right choice
        # for bf16 inputs anyway (bodies upcast their partials).
        o, lse = softmax_merge(o, lse, o_i, lse_i)
        # Rotate KV around the ring (skipped on the final step).
        kb, vb = jax.lax.cond(
            step < n - 1,
            lambda kv: (
                jax.lax.ppermute(kv[0], axis_name, perm),
                jax.lax.ppermute(kv[1], axis_name, perm),
            ),
            lambda kv: kv,
            (kb, vb),
        )
        return o, lse, kb, vb

    o0 = jnp.zeros(q.shape, jnp.float32)
    lse0 = jnp.full((b, h, s_local), -jnp.inf, jnp.float32)
    o, lse, _, _ = jax.lax.fori_loop(0, n, step_fn, (o0, lse0, k, v))
    return o.astype(q.dtype)


def make_ring_attention(
    mesh: Mesh,
    *,
    seq_axis: str = "seq",
    data_axis: Optional[str] = "data",
    model_axis: Optional[str] = "model",
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
):
    """Build a jitted sharded ring-attention callable for ``mesh``.

    Input/output layout (B, S, H, D) with batch on ``data_axis``, sequence
    on ``seq_axis``, heads on ``model_axis`` (2D/3D meshes supported —
    pass None to skip an axis). This is the §16 "head × context" 2D
    pattern: head parallelism needs no communication; the ring runs only
    on the sequence axis.
    """
    axes = dict(mesh.shape)
    for name in (seq_axis,):
        if name not in axes:
            raise ValueError(f"mesh has no axis {name!r}")
    spec = P(
        data_axis if data_axis in axes else None,
        seq_axis,
        model_axis if model_axis in axes else None,
        None,
    )

    fn = functools.partial(
        ring_attention,
        axis_name=seq_axis,
        causal=causal,
        sm_scale=sm_scale,
        block_q=block_q,
        block_kv=block_kv,
    )
    mapped = jax.shard_map(
        lambda q, k, v: fn(q, k, v),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    jitted = jax.jit(mapped)
    n_seq = mesh.shape[seq_axis]

    def with_telemetry(q, k, v):
        out = jitted(q, k, v)
        # Analytic per-call accounting: each of the n-1 ring steps moves
        # this device's K and V shards to its neighbor (telemetry is the
        # NoC-stats surface; see parallel/telemetry.py).
        try:
            from .telemetry import get_telemetry

            shard_bytes = (
                k.size // max(n_seq, 1) * jnp.dtype(k.dtype).itemsize
            )
            tel = get_telemetry()
            for _ in range(max(n_seq - 1, 0)):
                tel.record(seq_axis, "ppermute", 2 * shard_bytes, n_seq)
        except Exception:  # noqa: BLE001 - telemetry must never break compute
            pass
        return out

    return with_telemetry
