"""Pallas TPU flash-attention backward kernels (dq and dk/dv).

The reference has no explicit backward kernel — it differentiates through
its tiled forward with autograd (reference core/flash_attention_3.py:182-262
is forward-only). This module is the TPU-native equivalent of what a real
flash backward must be on hardware: two Mosaic kernels that recompute the
probability tiles from the saved logsumexp and accumulate gradients in
VMEM scratch, never materializing an (Sq, Skv) matrix in HBM.

Layout trick (avoids the lane-broadcast of lse/di that the stock JAX
pallas flash kernel pays for): both kernels compute in the *transposed*
score domain, s_t = K·Qᵀ of shape (block_kv, block_q), so the per-row
logsumexp and delta terms — indexed by q — live along the LANE dimension
and broadcast as (1, block_q) row vectors. No transposes, no 128x
lse/di HBM inflation, every matmul lands naturally on the MXU:

  dkv kernel, grid (B, H, kv_blocks, q_blocks), q innermost:
      p_t  = exp(s_t * scale - lse)            (block_kv, block_q)
      dv  += p_tᵀ-free:   p_t · dO             (block_kv, d)
      dp_t = V · dOᵀ                           (block_kv, block_q)
      ds_t = p_t ⊙ (dp_t - di) * scale
      dk  += ds_t · Q                          (block_kv, d)

  dq kernel, grid (B, H, q_blocks, kv_blocks), kv innermost:
      dq  += ds_tᵀ · K                         (block_q, d)

Both accumulate in fp32 VMEM scratch across the inner grid dimension and
write once at the last step, mirroring the forward kernel's structure
(ops/flash.py). Causal / sliding-window tiles outside the band are
skipped at the grid-step level.

GQA note: the gradient path receives group-repeated KV from the caller
(ops/flash.py::_flash_core_bwd) and the per-group dk/dv sum happens in
XLA — the inference path never repeats KV (native index maps).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_utils import NUM_LANES, dropout_keep, round_up


def _tile_masks(
    ki,
    qi,
    *,
    block_q: int,
    block_kv: int,
    kv_off: int,
    kv_true_len: int,
    has_kv_pad: bool,
    causal: bool,
    window: Optional[Tuple[Optional[int], Optional[int], str]],
):
    """Shared per-tile predicates for both kernels.

    Returns (should_run scalar, valid (block_kv, block_q) bool or None).
    Transposed tile convention: dim 0 = kv (sublanes), dim 1 = q (lanes).
    """
    if causal:
        should_run = ki * block_kv <= (qi + 1) * block_q - 1 + kv_off
    else:
        should_run = True
    rel_lo_t = ki * block_kv - (qi * block_q + block_q - 1 + kv_off)
    rel_hi_t = ki * block_kv + block_kv - 1 - (qi * block_q + kv_off)
    if window is not None:
        lo_, hi_, mode_ = window
        assert mode_ == "inside"
        if hi_ is not None:
            should_run = jnp.logical_and(should_run, rel_lo_t <= hi_)
        if lo_ is not None:
            should_run = jnp.logical_and(should_run, rel_hi_t >= lo_)

    valid = None

    def _and(a, b):
        return b if a is None else jnp.logical_and(a, b)

    if has_kv_pad or causal or window is not None:
        col = (
            jax.lax.broadcasted_iota(jnp.int32, (block_kv, block_q), 0)
            + ki * block_kv
        )
        row = (
            jax.lax.broadcasted_iota(jnp.int32, (block_kv, block_q), 1)
            + qi * block_q
            + kv_off
        )
        if has_kv_pad:
            valid = col < kv_true_len
        if causal:
            valid = _and(valid, col <= row)
        if window is not None:
            lo_, hi_, _ = window
            rel_m = col - row
            if lo_ is not None:
                valid = _and(valid, rel_m >= lo_)
            if hi_ is not None:
                valid = _and(valid, rel_m <= hi_)
    return should_run, valid


def _p_and_ds(
    q, k, v, do, lse_row, di_row, valid, *, sm_scale: float, mscale_t=None
):
    """Transposed-domain probability + score-grad tiles.

    q/do: (block_q, d); k/v: (block_kv, d); lse_row/di_row: (1, block_q).
    Returns (pv_t, ds_t) of shape (block_kv, block_q) in fp32, where
    ds_t already carries the sm_scale factor and pv_t is the P tile to
    contract with dO for dv. ``mscale_t`` (optional, (block_kv, block_q))
    is the attention-dropout keep/(1-rate) mask in the transposed layout:
    it scales the P.V path only (dv's P and the dp term; di = <o, do>
    is dropout-invariant — see ops/flash.py dropout notes).
    """
    s_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    logits = s_t * sm_scale - lse_row
    if valid is None:
        p_t = jnp.exp(logits)
    else:
        # where BEFORE exp keeps fully-masked rows (lse = -inf) finite.
        p_t = jnp.where(valid, jnp.exp(logits), 0.0)
    dp_t = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if mscale_t is not None:
        pv_t = p_t * mscale_t
        ds_t = p_t * (dp_t * mscale_t - di_row) * sm_scale
    else:
        pv_t = p_t
        ds_t = p_t * (dp_t - di_row) * sm_scale
    return pv_t, ds_t


def _dropout_mscale_t(
    seed_ref, ki, qi, bh, *, block_q, block_kv, kv_true_len, dropout_rate
):
    """Transposed-layout (block_kv, block_q) keep/(1-rate) tile from the
    positional hash — byte-identical to the forward kernel's mask.

    ``bh`` is the flattened (batch, head) grid index (hoisted by the
    caller — pl.program_id inside a pl.when body breaks the CPU
    interpreter) so masks are i.i.d. per batch element and head."""
    cols = (
        jax.lax.broadcasted_iota(jnp.int32, (block_kv, block_q), 0)
        + ki * block_kv
    )
    rows = (
        jax.lax.broadcasted_iota(jnp.int32, (block_kv, block_q), 1)
        + qi * block_q
    )
    keep = dropout_keep(
        seed_ref[0], rows, cols, kv_true_len, dropout_rate, bh=bh
    )
    return jnp.where(keep, 1.0 / (1.0 - dropout_rate), 0.0)


def _dkv_kernel(
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    di_ref,
    *rest,
    sm_scale: float,
    causal: bool,
    q_true_len: int,
    kv_true_len: int,
    block_q: int,
    block_kv: int,
    num_q_blocks: int,
    kv_blocks_total: int,
    window,
    dropout_rate: float = 0.0,
):
    if dropout_rate > 0.0:
        seed_ref, dk_ref, dv_ref, dk_scratch, dv_scratch = rest
    else:
        seed_ref = None
        dk_ref, dv_ref, dk_scratch, dv_scratch = rest
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    # Hoisted (see _dropout_mscale_t): flattened (batch, head) index.
    bh = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    kv_off = kv_true_len - q_true_len
    has_kv_pad = kv_blocks_total * block_kv > kv_true_len
    should_run, valid = _tile_masks(
        ki,
        qi,
        block_q=block_q,
        block_kv=block_kv,
        kv_off=kv_off,
        kv_true_len=kv_true_len,
        has_kv_pad=has_kv_pad,
        causal=causal,
        window=window,
    )

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse_row = lse_ref[0, 0]  # (1, block_q) fp32
        di_row = di_ref[0, 0]
        mscale_t = (
            _dropout_mscale_t(
                seed_ref, ki, qi, bh, block_q=block_q, block_kv=block_kv,
                kv_true_len=kv_true_len, dropout_rate=dropout_rate,
            )
            if dropout_rate > 0.0
            else None
        )
        p_t, ds_t = _p_and_ds(
            q, k, v, do, lse_row, di_row, valid, sm_scale=sm_scale,
            mscale_t=mscale_t,
        )
        dv_scratch[:] += jax.lax.dot(
            p_t.astype(do.dtype), do, preferred_element_type=jnp.float32
        )
        dk_scratch[:] += jax.lax.dot(
            ds_t.astype(q.dtype), q, preferred_element_type=jnp.float32
        )

    @pl.when(qi == num_q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[:].astype(dv_ref.dtype)


def _dq_kernel(
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    di_ref,
    *rest,
    sm_scale: float,
    causal: bool,
    q_true_len: int,
    kv_true_len: int,
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
    window,
    dropout_rate: float = 0.0,
):
    if dropout_rate > 0.0:
        seed_ref, dq_ref, dq_scratch = rest
    else:
        seed_ref = None
        dq_ref, dq_scratch = rest
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    # Hoisted (see _dropout_mscale_t): flattened (batch, head) index.
    bh = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    kv_off = kv_true_len - q_true_len
    has_kv_pad = num_kv_blocks * block_kv > kv_true_len
    should_run, valid = _tile_masks(
        ki,
        qi,
        block_q=block_q,
        block_kv=block_kv,
        kv_off=kv_off,
        kv_true_len=kv_true_len,
        has_kv_pad=has_kv_pad,
        causal=causal,
        window=window,
    )

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse_row = lse_ref[0, 0]
        di_row = di_ref[0, 0]
        mscale_t = (
            _dropout_mscale_t(
                seed_ref, ki, qi, bh, block_q=block_q, block_kv=block_kv,
                kv_true_len=kv_true_len, dropout_rate=dropout_rate,
            )
            if dropout_rate > 0.0
            else None
        )
        _, ds_t = _p_and_ds(
            q, k, v, do, lse_row, di_row, valid, sm_scale=sm_scale,
            mscale_t=mscale_t,
        )
        # ds_tᵀ · K, expressed as a dim-0/dim-0 contraction — no explicit
        # transpose materializes.
        dq_scratch[:] += jax.lax.dot_general(
            ds_t.astype(k.dtype),
            k,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_scratch[:].astype(dq_ref.dtype)


def flash_attention_bwd_pallas(
    q: jax.Array,  # [B, H, Sq, D] (unpadded)
    k: jax.Array,  # [B, H, Skv, D] (group-repeated for GQA by the caller)
    v: jax.Array,
    o: jax.Array,  # [B, H, Sq, D]
    lse: jax.Array,  # [B, H, Sq] fp32 (natural log)
    do: jax.Array,  # [B, H, Sq, D]
    *,
    sm_scale: float,
    causal: bool,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    interpret: bool = False,
    window: Optional[Tuple[Optional[int], Optional[int], str]] = None,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,  # (1,) int32
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Flash-attention backward via two Pallas kernels.

    Returns (dq, dk, dv) in the input dtypes. O(S) memory: probability
    tiles exist only in VMEM.
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]

    # Measured on v5e (linear-fit sweeps, causal, S 2K-8K): 1024x1024 wins
    # at D=64 (0.76 vs 0.84 ms at 512x512, B4 S2048 H12); the fatter
    # D=128 tiles shift the optimum to 512x1024 (1.60 vs 1.81 ms at
    # B1 S8192 H8).
    if block_q is None:
        block_q = 1024 if d <= 64 else 512
    if block_kv is None:
        block_kv = 1024

    block_q = min(block_q, max(NUM_LANES, round_up(sq, NUM_LANES)))
    block_kv = min(block_kv, max(NUM_LANES, round_up(skv, NUM_LANES)))
    sq_p = round_up(sq, block_q)
    skv_p = round_up(skv, block_kv)
    d_p = d if (d == 64 or d % 128 == 0) else round_up(d, NUM_LANES)

    di = jnp.sum(
        o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1
    )  # [B, H, Sq]

    pad_q = ((0, 0), (0, 0), (0, sq_p - sq), (0, d_p - d))
    pad_kv = ((0, 0), (0, 0), (0, skv_p - skv), (0, d_p - d))
    qp = jnp.pad(q, pad_q)
    dop = jnp.pad(do, pad_q)
    kp = jnp.pad(k, pad_kv)
    vp = jnp.pad(v, pad_kv)
    # lse pads with 0 (NOT -inf): padded q rows then produce finite p
    # which multiplies zero-padded do into zero contributions; -inf would
    # breed inf*0 NaNs in the dv matmul. The explicit singleton axis
    # ((B, H, 1, S)) satisfies Mosaic's block-shape rule: the second-minor
    # block dim must equal the array dim.
    lsep = jnp.pad(
        lse.astype(jnp.float32), ((0, 0), (0, 0), (0, sq_p - sq))
    )[:, :, None, :]
    dip = jnp.pad(di, ((0, 0), (0, 0), (0, sq_p - sq)))[:, :, None, :]

    num_q_blocks = sq_p // block_q
    num_kv_blocks = skv_p // block_kv

    kv_off_idx = skv - sq
    if causal and window is None:
        # Skip-aware prefetch (same trick as the forward kernel): in the
        # dkv grid (kv-major, q innermost) the skipped steps are the
        # leading q blocks above the diagonal — redirect their q/do/lse/di
        # DMA to the first q block this kv block will actually use.
        def q_block_index(i, j):
            first = jnp.maximum((i * block_kv - kv_off_idx) // block_q, 0)
            return jax.lax.select(
                i * block_kv <= (j + 1) * block_q - 1 + kv_off_idx, j, first
            )

    else:
        q_block_index = lambda i, j: j  # noqa: E731

    qspec = pl.BlockSpec(
        (1, 1, block_q, d_p),
        lambda b_, h_, i, j: (b_, h_, q_block_index(i, j), 0),
    )
    kvspec_dkv = pl.BlockSpec(
        (1, 1, block_kv, d_p), lambda b_, h_, i, j: (b_, h_, i, 0)
    )
    rowspec = pl.BlockSpec(
        (1, 1, 1, block_q),
        lambda b_, h_, i, j: (b_, h_, 0, q_block_index(i, j)),
    )

    has_drop = dropout_rate > 0.0
    seed_inputs = []
    seed_specs = []
    if has_drop:
        seed_inputs = [dropout_seed.astype(jnp.int32).reshape(1)]
        seed_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]

    dkv_kernel = functools.partial(
        _dkv_kernel,
        sm_scale=sm_scale,
        causal=causal,
        q_true_len=sq,
        kv_true_len=skv,
        block_q=block_q,
        block_kv=block_kv,
        num_q_blocks=num_q_blocks,
        kv_blocks_total=num_kv_blocks,
        window=window,
        dropout_rate=dropout_rate,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, h, num_kv_blocks, num_q_blocks),
        in_specs=[qspec, kvspec_dkv, kvspec_dkv, qspec, rowspec, rowspec]
        + seed_specs,
        out_specs=(
            pl.BlockSpec(
                (1, 1, block_kv, d_p), lambda b_, h_, i, j: (b_, h_, i, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d_p), lambda b_, h_, i, j: (b_, h_, i, 0)
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, skv_p, d_p), k.dtype),
            jax.ShapeDtypeStruct((b, h, skv_p, d_p), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_kv, d_p), jnp.float32),
            pltpu.VMEM((block_kv, d_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, dip, *seed_inputs)

    if causal and window is None:
        # dq grid (q-major, kv innermost): skipped steps are the trailing
        # kv blocks past the diagonal — redirect their DMA to block 0,
        # the first block the next q row needs.
        def kv_block_index(i, j):
            return jax.lax.select(
                j * block_kv <= (i + 1) * block_q - 1 + kv_off_idx, j, 0
            )

    else:
        kv_block_index = lambda i, j: j  # noqa: E731

    qspec_dq = pl.BlockSpec(
        (1, 1, block_q, d_p), lambda b_, h_, i, j: (b_, h_, i, 0)
    )
    kvspec_dq = pl.BlockSpec(
        (1, 1, block_kv, d_p),
        lambda b_, h_, i, j: (b_, h_, kv_block_index(i, j), 0),
    )
    rowspec_dq = pl.BlockSpec(
        (1, 1, 1, block_q), lambda b_, h_, i, j: (b_, h_, 0, i)
    )

    dq_kernel = functools.partial(
        _dq_kernel,
        sm_scale=sm_scale,
        causal=causal,
        q_true_len=sq,
        kv_true_len=skv,
        block_q=block_q,
        block_kv=block_kv,
        num_kv_blocks=num_kv_blocks,
        window=window,
        dropout_rate=dropout_rate,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, h, num_q_blocks, num_kv_blocks),
        in_specs=[
            qspec_dq,
            kvspec_dq,
            kvspec_dq,
            qspec_dq,
            rowspec_dq,
            rowspec_dq,
        ]
        + seed_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d_p), lambda b_, h_, i, j: (b_, h_, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d_p), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d_p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, dip, *seed_inputs)

    return (
        dq[:, :, :sq, :d],
        dk[:, :, :skv, :d],
        dv[:, :, :skv, :d],
    )


# ---------------------------------------------------------------------------
# Round-5 unrolled backward (see ops/flash_unrolled.py for the forward
# counterpart and docs/kernels.md "Round 5" for the measured story).
#
# The grid kernels above run one tile per grid step; the tile body's
# VPU stream (exp recompute, ds arithmetic, casts) serializes against
# its 3-4 matmuls. Unrolling the inner grid dimension into straight-
# line bodies with STATIC triangular extents lets Mosaic's VLIW
# scheduler overlap them. Measured (v5e, causal, 512x512, vs the tuned
# grid kernels): 1.21x at D=64 B4 S2048, 1.19x at S8192, 1.36x at
# D=128 B4 S4096. Scope: plain causal/non-causal square self-attention
# (no window/dropout/rel-bias — those ride the grid kernels), inside
# the VMEM envelope below.
# ---------------------------------------------------------------------------

# 12, not 16: the backward always composes inside a larger grad graph
# sharing the scoped-VMEM stack (same lesson as the forward's
# COMPOSED_MAX_TILES — a 16-tile unrolled body OOMed scoped VMEM inside
# T5-Large's decoder loop while compiling standalone).
_BWD_UNROLL_MAX_TILES = 12


def bwd_unrolled_supported(
    seq_len: int, head_dim: int, itemsize: int = 2,
    *, block_q: int = 512, block_kv: int = 512,
) -> bool:
    """Envelope for the unrolled backward: full Q/dO (dkv pass) and K/V
    (dq pass) extents VMEM-resident, body tile count bounded."""
    if seq_len % block_q or seq_len % block_kv:
        return False
    if max(block_q, block_kv) > 512:
        return False
    if seq_len // block_kv > _BWD_UNROLL_MAX_TILES:
        return False
    if seq_len // block_q > _BWD_UNROLL_MAX_TILES:
        return False
    return 2 * seq_len * head_dim * itemsize <= 8 * 1024 * 1024


def _dq_kernel_unrolled(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref,
    *, block_kv: int, sm_scale: float, causal: bool, q_row0: int,
):
    bq, d = q_ref.shape[2], q_ref.shape[3]
    n_kv = k_ref.shape[2] // block_kv
    q = q_ref[0, 0]
    do = do_ref[0, 0]
    lse_row = lse_ref[0, 0]  # (1, bq) fp32
    di_row = di_ref[0, 0]
    dq = jnp.zeros((bq, d), jnp.float32)
    for j in range(n_kv):
        k = k_ref[0, 0, pl.ds(j * block_kv, block_kv), :]
        v = v_ref[0, 0, pl.ds(j * block_kv, block_kv), :]
        s_t = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        logits = s_t * sm_scale - lse_row
        if causal and (j + 1) * block_kv > q_row0:
            col_kv = (
                jax.lax.broadcasted_iota(jnp.int32, (block_kv, bq), 0)
                + j * block_kv
            )
            row_q = (
                jax.lax.broadcasted_iota(jnp.int32, (block_kv, bq), 1) + q_row0
            )
            p_t = jnp.where(col_kv <= row_q, jnp.exp(logits), 0.0)
        else:
            p_t = jnp.exp(logits)
        dp_t = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds_t = p_t * (dp_t - di_row) * sm_scale
        dq = dq + jax.lax.dot_general(
            ds_t.astype(k.dtype), k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _dkv_kernel_unrolled(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref,
    *, block_q: int, sm_scale: float, causal: bool, kv_col0: int,
    q_block0: int,
):
    bkv, d = k_ref.shape[2], k_ref.shape[3]
    n_q = q_ref.shape[2] // block_q
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    dk = jnp.zeros((bkv, d), jnp.float32)
    dv = jnp.zeros((bkv, d), jnp.float32)
    for j in range(q_block0, n_q):
        rows = pl.ds(j * block_q, block_q)
        q = q_ref[0, 0, rows, :]
        do = do_ref[0, 0, rows, :]
        lse_row = lse_ref[0, 0, :, pl.ds(j * block_q, block_q)]
        di_row = di_ref[0, 0, :, pl.ds(j * block_q, block_q)]
        s_t = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        logits = s_t * sm_scale - lse_row
        if causal and kv_col0 + bkv > j * block_q:
            col_kv = (
                jax.lax.broadcasted_iota(jnp.int32, (bkv, block_q), 0)
                + kv_col0
            )
            row_q = (
                jax.lax.broadcasted_iota(jnp.int32, (bkv, block_q), 1)
                + j * block_q
            )
            p_t = jnp.where(col_kv <= row_q, jnp.exp(logits), 0.0)
        else:
            p_t = jnp.exp(logits)
        dp_t = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds_t = p_t * (dp_t - di_row) * sm_scale
        dv = dv + jax.lax.dot(
            p_t.astype(do.dtype), do, preferred_element_type=jnp.float32
        )
        dk = dk + jax.lax.dot(
            ds_t.astype(q.dtype), q, preferred_element_type=jnp.float32
        )
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def flash_attention_bwd_unrolled(
    q: jax.Array,  # [B, H, S, D]
    k: jax.Array,
    v: jax.Array,
    o: jax.Array,
    lse: jax.Array,  # [B, H, S] fp32
    do: jax.Array,
    *,
    sm_scale: float,
    causal: bool,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Unrolled backward: dq via per-q-block calls (K/V resident), dk/dv
    via per-kv-block calls (Q/dO/lse/di resident, static q suffix).
    Same [B, H, S, D] contract as flash_attention_bwd_pallas; callers
    gate with bwd_unrolled_supported()."""
    b, h, s, d = q.shape
    n_q = s // block_q
    n_kv = s // block_kv
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    lse4 = lse.astype(jnp.float32)[:, :, None, :]
    di4 = di[:, :, None, :]

    dqs = []
    for i in range(n_q):
        kv_tiles = (
            min((i * block_q + block_q + block_kv - 1) // block_kv, n_kv)
            if causal
            else n_kv
        )
        span = kv_tiles * block_kv
        kern = functools.partial(
            _dq_kernel_unrolled, block_kv=block_kv, sm_scale=sm_scale,
            causal=causal, q_row0=i * block_q,
        )
        dq_i = pl.pallas_call(
            kern,
            grid=(b, h),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i=i: (b_, h_, i, 0)),
                pl.BlockSpec((1, 1, span, d), lambda b_, h_: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, span, d), lambda b_, h_: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i=i: (b_, h_, i, 0)),
                pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, i=i: (b_, h_, 0, i)),
                pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, i=i: (b_, h_, 0, i)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, d), lambda b_, h_: (b_, h_, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((b, h, block_q, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(q, k, v, do, lse4, di4)
        dqs.append(dq_i)
    dq = jnp.concatenate(dqs, axis=2) if len(dqs) > 1 else dqs[0]

    dks, dvs = [], []
    for ki in range(n_kv):
        q_block0 = (ki * block_kv) // block_q if causal else 0
        kern = functools.partial(
            _dkv_kernel_unrolled, block_q=block_q, sm_scale=sm_scale,
            causal=causal, kv_col0=ki * block_kv, q_block0=q_block0,
        )
        dk_i, dv_i = pl.pallas_call(
            kern,
            grid=(b, h),
            in_specs=[
                pl.BlockSpec((1, 1, s, d), lambda b_, h_: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_, ki=ki: (b_, h_, ki, 0)),
                pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_, ki=ki: (b_, h_, ki, 0)),
                pl.BlockSpec((1, 1, s, d), lambda b_, h_: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, 1, s), lambda b_, h_: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, 1, s), lambda b_, h_: (b_, h_, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_: (b_, h_, 0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, h, block_kv, d), k.dtype),
                jax.ShapeDtypeStruct((b, h, block_kv, d), v.dtype),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(q, k, v, do, lse4, di4)
        dks.append(dk_i)
        dvs.append(dv_i)
    dk = jnp.concatenate(dks, axis=2) if len(dks) > 1 else dks[0]
    dv = jnp.concatenate(dvs, axis=2) if len(dvs) > 1 else dvs[0]
    return dq, dk, dv
