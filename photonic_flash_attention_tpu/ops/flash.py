"""Pallas TPU flash-attention (tiled online-softmax) with custom VJP.

The TPU-native rebirth of the reference's hot loop — the two-level tiled
online-softmax in ``_tiled_attention`` (reference
core/flash_attention_3.py:182-262) — as a Mosaic kernel:

* grid (batch, heads, q-blocks, kv-blocks); kv-blocks is the sequential
  ("arbitrary") reduction dimension,
* running max ``m`` / running sum ``l`` / rescaled accumulator in fp32
  VMEM scratch that persists across kv-blocks,
* causal tiles above the diagonal are skipped entirely,
* scores never materialize beyond one (block_q, block_kv) tile.

The backward pass recomputes probabilities from the saved logsumexp
blockwise (O(S) memory) — the reference differentiates through its tiled
forward with autograd (no explicit backward kernel exists there), so a
recompute-based VJP is the faithful-but-faster equivalent.

API shape convention: (batch, seq, num_heads, head_dim).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_utils import NUM_LANES, cdiv, resolve_interpret, round_up
from .reference import DEFAULT_MASK_VALUE


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _flash_fwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,  # None when save_residuals=False (inference fast path)
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    sm_scale: float,
    causal: bool,
    kv_true_len: int,
    q_true_len: int,
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    # Causal: skip kv blocks entirely above the diagonal. Row/col offsets are
    # aligned at the sequence end (decode convention) via kv_off.
    kv_off = kv_true_len - q_true_len
    if causal:
        # Last usable column for this q block: (qi+1)*block_q - 1 + kv_off.
        should_run = ki * block_kv <= (qi + 1) * block_q - 1 + kv_off
    else:
        should_run = True

    # The last kv block carries padded columns only when padding exists
    # (static): interior tiles then skip mask work entirely.
    has_kv_pad = num_kv_blocks * block_kv > kv_true_len

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]  # [block_q, d]
        k = k_ref[0, 0]  # [block_kv, d]
        s = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # Natural-exp softmax: measured on v5e, Mosaic's exp lowering
        # beats an explicit base-2 rewrite (exp2 + folded log2(e) scale
        # benched ~15% SLOWER end-to-end) — don't "optimize" this.
        s = s * sm_scale

        def apply_mask(s):
            col = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
                + ki * block_kv
            )
            if has_kv_pad:
                valid = col < kv_true_len
            else:
                valid = None
            if causal:
                row = (
                    jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
                    + qi * block_q
                    + kv_off
                )
                causal_ok = col <= row
                valid = (
                    causal_ok if valid is None
                    else jnp.logical_and(valid, causal_ok)
                )
            return jnp.where(valid, s, DEFAULT_MASK_VALUE)

        # Mask when any tile could need it: padded last-kv tiles, causal
        # tiles. (A per-tile lax.cond to skip interior tiles measures
        # SLOWER on v5e — the scalar-core branch stalls the Mosaic
        # pipeline — so masking is unconditional when enabled; only the
        # fully-static no-pad non-causal case elides it.)
        if has_kv_pad or causal:
            s = apply_mask(s)

        m_prev = m_scratch[:, :1]  # [block_q, 1]
        l_prev = l_scratch[:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)  # [block_q, block_kv]
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        m_scratch[:] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[:] = jnp.broadcast_to(l_next, l_scratch.shape)

        v = v_ref[0, 0]  # [block_kv, d]
        pv = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        acc_scratch[:] = acc_scratch[:] * alpha + pv

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        l_fin = l_scratch[:, :1]
        l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
        o_ref[0, 0] = (acc_scratch[:] * l_inv).astype(o_ref.dtype)
        if lse_ref is not None:
            # logsumexp for backward/merging, converted from the base-2
            # running domain to natural log; fully-masked rows -> -inf.
            m_fin = m_scratch[:, :1]
            lse = m_fin + jnp.log(jnp.where(l_fin == 0.0, 1.0, l_fin))
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _flash_fwd(
    q: jax.Array,  # [B, Hq, Sq, D] padded
    k: jax.Array,  # [B, Hkv, Skv, D] padded (native GQA: Hkv may < Hq)
    v: jax.Array,
    *,
    sm_scale: float,
    causal: bool,
    q_true_len: int,
    kv_true_len: int,
    block_q: int,
    block_kv: int,
    interpret: bool,
    save_residuals: bool,
    group: int = 1,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    b, h, sq, d = q.shape
    skv = k.shape[2]
    num_q_blocks = sq // block_q
    num_kv_blocks = skv // block_kv

    grid = (b, h, num_q_blocks, num_kv_blocks)

    out_shape = [jax.ShapeDtypeStruct((b, h, sq, d), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0))
    ]
    if save_residuals:
        # The lse output costs real HBM writes (B*H*S*128 fp32 — 2x the
        # bf16 output bytes); the inference path skips it entirely.
        out_shape.append(
            jax.ShapeDtypeStruct((b, h, sq, NUM_LANES), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 1, block_q, NUM_LANES), lambda b_, h_, qi, ki: (b_, h_, qi, 0)
            )
        )
        kernel_fn = _flash_fwd_kernel
    else:
        def kernel_fn(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, **kw):
            return _flash_fwd_kernel(
                q_ref, k_ref, v_ref, o_ref, None, m_s, l_s, acc_s, **kw
            )

    kernel = functools.partial(
        kernel_fn,
        sm_scale=sm_scale,
        causal=causal,
        kv_true_len=kv_true_len,
        q_true_len=q_true_len,
        block_q=block_q,
        block_kv=block_kv,
        num_kv_blocks=num_kv_blocks,
    )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
            # GQA natively: each group of q heads reads the SAME kv head
            # tile (index h // group) — no repeated KV in HBM; Mosaic's
            # revisiting-aware pipeline skips the re-fetch when the index
            # map returns the same block.
            pl.BlockSpec(
                (1, 1, block_kv, d),
                lambda b_, h_, qi, ki: (b_, h_ // group, ki, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d),
                lambda b_, h_, qi, ki: (b_, h_ // group, ki, 0),
            ),
        ],
        out_specs=tuple(out_specs) if save_residuals else out_specs[0],
        out_shape=tuple(out_shape) if save_residuals else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    if save_residuals:
        o, lse = outs
        return o, lse[..., 0]
    return outs, None


# ---------------------------------------------------------------------------
# Backward (blockwise recompute from logsumexp)
# ---------------------------------------------------------------------------


def _flash_bwd(
    q: jax.Array,  # [B, H, Sq, D] fp32-upcast inside
    k: jax.Array,
    v: jax.Array,
    o: jax.Array,
    lse: jax.Array,  # [B, H, Sq]
    do: jax.Array,
    *,
    sm_scale: float,
    causal: bool,
    q_true_len: int,
    kv_true_len: int,
    block_kv: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    b, h, sq, d = q.shape
    skv = k.shape[2]
    num_blocks = skv // block_kv
    kv_off = kv_true_len - q_true_len

    qf = q.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    of = o.astype(jnp.float32)
    di = jnp.sum(of * dof, axis=-1, keepdims=True)  # [B,H,Sq,1]
    lse_e = lse[..., None]  # [B,H,Sq,1]

    kb = k.astype(jnp.float32).reshape(b, h, num_blocks, block_kv, d)
    vb = v.astype(jnp.float32).reshape(b, h, num_blocks, block_kv, d)
    kb = kb.transpose(2, 0, 1, 3, 4)
    vb = vb.transpose(2, 0, 1, 3, 4)

    row = jax.lax.broadcasted_iota(jnp.int32, (sq, block_kv), 0) + kv_off

    def body(dq_acc, inputs):
        blk_idx, k_blk, v_blk = inputs
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_blk) * sm_scale
        col = (
            jax.lax.broadcasted_iota(jnp.int32, (sq, block_kv), 1) + blk_idx * block_kv
        )
        valid = col < kv_true_len
        if causal:
            valid = jnp.logical_and(valid, col <= row)
        # p from saved lse: rows fully masked have lse=-inf -> p=0 via where.
        p = jnp.where(valid[None, None], jnp.exp(s - lse_e), 0.0)
        dv_blk = jnp.einsum("bhqk,bhqd->bhkd", p, dof)
        dp = jnp.einsum("bhqd,bhkd->bhqk", dof, v_blk)
        ds = p * (dp - di) * sm_scale
        dq_acc = dq_acc + jnp.einsum("bhqk,bhkd->bhqd", ds, k_blk)
        dk_blk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf)
        return dq_acc, (dk_blk, dv_blk)

    blk_ids = jnp.arange(num_blocks, dtype=jnp.int32)
    dq, (dk_blocks, dv_blocks) = jax.lax.scan(
        body, jnp.zeros_like(qf), (blk_ids, kb, vb)
    )
    dk = dk_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, skv, d)
    dv = dv_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, skv, d)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# ---------------------------------------------------------------------------
# Public entry point
# ---------------------------------------------------------------------------


def _choose_block(seq: int, default: int) -> int:
    """Clamp the tuned default to the (padded) sequence length."""
    return min(default, max(NUM_LANES, round_up(seq, NUM_LANES)))


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def _flash_attention_core(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: float,
    causal: bool,
    block_q: int,
    block_kv: int,
    interpret: bool,
) -> jax.Array:
    # Primal (inference) path: no residuals, no lse HBM traffic.
    o, _ = _flash_core_fwd_impl(
        q, k, v, sm_scale, causal, block_q, block_kv, interpret,
        save_residuals=False,
    )
    return o


def _pad_head_dim(d: int) -> int:
    """64 is a natively-supported lane width (half-MXU); anything else pads
    to a 128 multiple. Avoids doubling HBM traffic for D=64 models."""
    if d == 64 or d % 128 == 0:
        return d
    return round_up(d, NUM_LANES)


def _flash_core_fwd_impl(
    q, k, v, sm_scale, causal, block_q, block_kv, interpret, save_residuals=True
):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    hkv = k.shape[1]
    # Pad seq dims to block multiples; head_dim per _pad_head_dim.
    sq_p = round_up(sq, block_q)
    skv_p = round_up(skv, block_kv)
    d_p = _pad_head_dim(d)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, d_p - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, d_p - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, d_p - d)))
    o, lse = _flash_fwd(
        qp,
        kp,
        vp,
        sm_scale=sm_scale,
        causal=causal,
        q_true_len=sq,
        kv_true_len=skv,
        block_q=block_q,
        block_kv=block_kv,
        interpret=interpret,
        save_residuals=save_residuals,
        group=h // hkv,
    )
    return o[:, :, :sq, :d], (lse[:, :, :sq] if lse is not None else None)


def _flash_core_fwd(q, k, v, sm_scale, causal, block_q, block_kv, interpret):
    o, lse = _flash_core_fwd_impl(
        q, k, v, sm_scale, causal, block_q, block_kv, interpret,
        save_residuals=True,
    )
    return o, (q, k, v, o, lse)


def _flash_core_bwd(sm_scale, causal, block_q, block_kv, interpret, residuals, do):
    q, k, v, o, lse = residuals
    b, h, _, d = q.shape
    hkv = k.shape[1]
    group = h // hkv
    skv = k.shape[2]
    skv_p = round_up(skv, block_kv)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    if group > 1:
        # The grad path materializes repeated KV (training only); the
        # primal/inference path never does (native GQA index maps).
        kp = jnp.repeat(kp, group, axis=1)
        vp = jnp.repeat(vp, group, axis=1)
    dq, dk, dv = _flash_bwd(
        q,
        kp,
        vp,
        o,
        lse,
        do,
        sm_scale=sm_scale,
        causal=causal,
        q_true_len=q.shape[2],
        kv_true_len=skv,
        block_kv=block_kv,
    )
    dk = dk[:, :, :skv]
    dv = dv[:, :, :skv]
    if group > 1:
        dk = dk.reshape(b, hkv, group, skv, d).sum(2)
        dv = dv.reshape(b, hkv, group, skv, d).sum(2)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


_flash_attention_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention on TPU via Pallas.

    Args:
      q: (B, Sq, Hq, D); k/v: (B, Skv, Hkv, D) with Hq % Hkv == 0 (GQA).
      causal: apply causal masking (sequence-end aligned when Sq != Skv).
      sm_scale: score scale, default 1/sqrt(D).
      block_q / block_kv: kernel tile sizes (multiples of 128); autotuned
        defaults otherwise.
      interpret: force Pallas interpreter mode (auto on non-TPU backends).

    Returns:
      (B, Sq, Hq, D) attention output in q.dtype. Differentiable.
    """
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    if hq % hkv:
        raise ValueError(f"Hq {hq} not divisible by Hkv {hkv} (GQA)")

    scale = sm_scale if sm_scale is not None else d ** -0.5
    # Measured sweet spot on v5e (dispatch-overhead-free linear-fit sweeps
    # at S in 1K..8K, D=64/128): 1024 x 1024 wins at every geometry tried
    # (e.g. B4xS2048xH12xD64 causal: 0.629 ms vs 0.719 ms at 512x1024).
    bq = block_q or _choose_block(sq, 1024)
    bkv = block_kv or _choose_block(skv, 1024)
    interp = resolve_interpret(interpret)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    o = _flash_attention_core(qt, kt, vt, scale, causal, bq, bkv, interp)
    return o.transpose(0, 2, 1, 3)


def flash_attention_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Flash attention also returning the per-row logsumexp.

    Returns (output (B, Sq, Hq, D), lse (B, Hq, Sq) fp32). The lse makes
    partial attention results mergeable across KV shards — the primitive
    ring attention is built from (fully-masked rows have lse = -inf and a
    zero output row, so they drop out of the merge). Forward-only.
    """
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    if hq % hkv:
        raise ValueError(f"Hq {hq} not divisible by Hkv {hkv} (GQA)")
    scale = sm_scale if sm_scale is not None else d ** -0.5
    bq = block_q or _choose_block(sq, 1024)
    bkv = block_kv or _choose_block(skv, 1024)
    interp = resolve_interpret(interpret)
    o, lse = _flash_core_fwd_impl(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        scale,
        causal,
        bq,
        bkv,
        interp,
    )
    return o.transpose(0, 2, 1, 3), lse
