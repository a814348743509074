"""Unrolled-KV flash attention — the round-5 VPU/MXU-overlap kernels.

WHY THIS EXISTS (measured, docs/kernels.md "Round 5"): the grid-loop
flash kernel (ops/flash.py) runs one kv tile per grid step, and Mosaic
schedules each step's body serially — so every tile pays
``t_vpu(softmax stream) + t_mxu(QK + P.V)`` even though the TPU's VLIW
bundles can dual-issue vector and matrix ops. Putting consecutive kv
tiles in ONE straight-line body (python-unrolled, online-softmax state
as SSA values, K/V rows VMEM-resident) lets the scheduler overlap
softmax(i) with the matmuls of tile i+1.

Measured on v5e (b4 geometries, dispatch-free linear fits, vs the tuned
grid kernels at the same shapes):

  * causal D=64 b4 s2048:   65.9 vs 49.1 TFLOP/s  (1.34x)
  * causal D=64 b1 s8192:   82.8 vs 64.2          (1.29x)
  * causal D=128 GQA s4096: 145.6 vs 97.9         (1.49x, 74% of the
    197 bf16 ceiling — the VERDICT r4 #4 ">=70% of ceiling" target)
  * non-causal D=128 GQA:   166.8 bf16 / 175.2 int8-QK vs 131/148
    (int8-QK unrolled = 89% of the bf16 ceiling)

Structure: **triangular** — causal masking is handled by one
``pallas_call`` per q row-block with a STATIC kv extent (row i attends
to exactly ceil((i+1)*bq/bkv) tiles), so there is zero above-diagonal
waste and only diagonal-straddling tiles pay the mask select (which the
round-5 probe measured as nearly free anyway). Non-causal collapses to
a single call with the full extent per row.

Scope: causal/non-causal square self-attention, GQA, optional
per-tensor int8-QK, and (third pass) a per-key additive bias stream —
key-padding masks and real per-key biases; `flash_attention_with_lse`
and the engine's "key" route convert kv_lens to the bias form. Dense
(Sq, Skv) biases, windows, rel-bias tables, dropout, and need_weights
ride the grid kernel (ops/flash.py). The forward is engaged inside
flash_attention's custom VJP together with the matching unrolled
backward (ops/flash_bwd.py) for plain square bf16 shapes.

VMEM bound: the whole per-(b,h) K/V extent must sit in VMEM and the
unrolled body's temporaries in scoped VMEM (16 MB). Measured limits:
16 tiles of (512, 512) fp32 body temps compile at bf16; the int8 body
(extra int32 score tile) and 1024-row q blocks blow the scoped limit
at 16 tiles. `unrolled_supported()` encodes the measured envelope.

Reference pairing: same contract as the reference's forward
(core/flash_attention_3.py:182-262) on its mask-free path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_utils import resolve_interpret

NEG_INF = -1e30

#: Measured scoped-VMEM envelope (v5e, 16 MB limit): max unrolled kv
#: tiles per call body. bf16 at (512,512) tiles compiles at 16; the
#: int8 body carries an extra int32 score tile per step and fails at
#: 16 (16.86 MB) — cap it at 12.
MAX_UNROLL_TILES_BF16 = 16
MAX_UNROLL_TILES_INT8 = 12


#: Tile cap when the unrolled call COMPOSES inside a larger jitted
#: program (a model layer under scan/while): the surrounding program
#: shares the 16 MB scoped-VMEM stack, and a 16-tile body measured
#: 16.96 MB inside T5-Large's decoder loop (988 KB over) while the
#: same body compiles standalone. Composition callers (the
#: flash_attention core gate, flash_attention_with_lse) pass this.
COMPOSED_MAX_TILES = 12


def unrolled_supported(
    seq_len: int, head_dim: int, *, block_q: int = 512, block_kv: int = 512,
    int8_qk: bool = False, max_tiles: Optional[int] = None,
) -> bool:
    """True when the unrolled kernel's measured VMEM envelope admits
    this geometry (full K/V extent resident + body temps in scoped
    VMEM). ``max_tiles`` overrides the standalone-call tile cap —
    composition contexts pass COMPOSED_MAX_TILES."""
    if seq_len % block_q or seq_len % block_kv:
        return False
    if block_q > 512:
        return False  # 1024-row q blocks OOM the scoped limit at 16 tiles
    if max_tiles is None:
        max_tiles = MAX_UNROLL_TILES_INT8 if int8_qk else MAX_UNROLL_TILES_BF16
    elif int8_qk:
        max_tiles = min(max_tiles, MAX_UNROLL_TILES_INT8)
    if seq_len // block_kv > max_tiles:
        return False
    # K/V resident bytes per (b, h): keep under ~8 MB so double buffering
    # and q/o fit alongside.
    kv_bytes = 2 * seq_len * head_dim * (1 if int8_qk else 2)
    return kv_bytes <= 8 * 1024 * 1024


def _body_tile(q, k_ref, v_ref, state, j, block_kv, sm_scale_arr, causal,
               q_row0, bq, d, int8_qk, kbias_ref=None):
    """One unrolled kv tile: SSA state in, SSA state out."""
    m, l, acc = state
    lanes = pl.ds(j * block_kv, block_kv)
    k = k_ref[0, 0, lanes, :]
    if int8_qk:
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * sm_scale_arr[0]
    else:
        s = jax.lax.dot_general(
            q, k.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale_arr[0]
    if kbias_ref is not None:
        # Per-key additive bias (post-scale, the flash.py kbias
        # convention: 0 = attend, DEFAULT_MASK_VALUE = ignore, real
        # values = bias). (1, block_kv) broadcast over q rows.
        s = s + kbias_ref[0, 0:1, lanes]
    if causal and (j + 1) * block_kv > q_row0:
        # Only diagonal-straddling tiles pay the mask select.
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 0) + q_row0
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1) + j * block_kv
        s = jnp.where(col <= row, s, NEG_INF)
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m, m_curr)
    rep = block_kv // 128
    m_wide = m_next if rep == 1 else jnp.tile(m_next, (1, rep))
    p = jnp.exp(s - m_wide)
    alpha = jnp.exp(m - m_next)
    l = alpha * l + jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0, 0, lanes, :].astype(jnp.bfloat16)
    pv = jax.lax.dot(
        p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32
    )
    alpha_d = alpha[:, :d] if d <= 128 else jnp.tile(alpha, (1, d // 128))
    return m_next, l, acc * alpha_d + pv


def _kernel(q_ref, k_ref, v_ref, scale_ref, *rest, block_kv: int,
            q_row0: int, causal: bool, int8_qk: bool, has_kbias: bool = False):
    if has_kbias:
        kbias_ref, o_ref, *maybe_lse = rest
    else:
        kbias_ref = None
        o_ref, *maybe_lse = rest
    bq, d = q_ref.shape[2], q_ref.shape[3]
    n_kv = k_ref.shape[2] // block_kv
    q = q_ref[0, 0] if int8_qk else q_ref[0, 0].astype(jnp.bfloat16)
    state = (
        jnp.full((bq, 128), NEG_INF, jnp.float32),
        jnp.zeros((bq, 128), jnp.float32),
        jnp.zeros((bq, d), jnp.float32),
    )
    for j in range(n_kv):
        state = _body_tile(
            q, k_ref, v_ref, state, j, block_kv, scale_ref, causal,
            q_row0, bq, d, int8_qk, kbias_ref=kbias_ref,
        )
    m, l, acc = state
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    l_inv_d = l_inv[:, :d] if d <= 128 else jnp.tile(l_inv, (1, d // 128))
    o_ref[0, 0] = (acc * l_inv_d).astype(o_ref.dtype)
    if maybe_lse:
        # Natural-log lse of the SCALED scores (the flash.py residual
        # convention: bwd recomputes p = exp(s*scale - lse)). Lane-
        # replicated (block_q, 128); the caller slices lane 0.
        lse_ref = maybe_lse[0]
        lse_ref[0, 0] = m + jnp.log(jnp.where(l == 0.0, 1.0, l))


def _quant_per_tensor(x):
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    sc = jnp.where(absmax == 0.0, 1.0, absmax / 127.0)
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / sc), -127.0, 127.0
    ).astype(jnp.int8)
    return xq, sc


def unrolled_fwd_bhsd(
    q: jax.Array,  # (B, H, S, D)
    k: jax.Array,  # (B, Hkv, S, D)
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    int8_qk: bool = False,
    save_lse: bool = False,
    k_bias: Optional[jax.Array] = None,  # (B, S_kv) fp32 per-key bias
    interpret: Optional[bool] = None,
):
    """(B, H, S, D)-native unrolled forward; the layout flash.py's core
    and the training VJP already use (no transposes at the boundary).

    Returns (o, lse) with lse (B, H, S) fp32 (natural log of the scaled
    -score softmax denominator, the flash.py residual convention) when
    ``save_lse``, else (o, None). ``k_bias`` adds a per-key score bias
    post-scale (the flash.py kbias convention — key-padding masks and
    real biases both ride it); rows with EVERY key masked follow the
    grid kernel's finite-mask semantics.
    """
    b, h, s, d = q.shape
    hkv = k.shape[1]
    s_kv = k.shape[2]
    if h % hkv:
        raise ValueError(f"Hq ({h}) must be a multiple of Hkv ({hkv})")
    if causal and s_kv != s:
        # Rectangular extents are supported NON-causal only (segmented
        # long-context callers slice interior kv spans; causal diagonal
        # semantics need the square local coordinate alignment).
        raise ValueError(
            f"causal unrolled flash requires Sq == Skv, got {s} vs {s_kv}"
        )
    if s_kv % block_kv or s % block_q:
        raise ValueError(
            f"Sq ({s}) / Skv ({s_kv}) must be multiples of the blocks "
            f"({block_q}, {block_kv})"
        )
    group = h // hkv
    interp = resolve_interpret(interpret)
    if not interp and not unrolled_supported(
        max(s, s_kv), d, block_q=block_q, block_kv=block_kv, int8_qk=int8_qk
    ):
        raise ValueError(
            f"unrolled flash does not support Sq={s}, Skv={s_kv}, D={d}, "
            f"blocks=({block_q},{block_kv}), int8_qk={int8_qk}; gate with "
            f"unrolled_supported()"
        )
    scale = sm_scale if sm_scale is not None else d ** -0.5
    n_q = s // block_q
    n_kv_total = s_kv // block_kv

    if int8_qk:
        qt, qs = _quant_per_tensor(q)
        kt, ks = _quant_per_tensor(k)
        scale_arr = (qs * ks * scale).reshape(1).astype(jnp.float32)
    else:
        scale_arr = jnp.full((1,), scale, jnp.float32)
        qt, kt = q, k
    vt = v

    def one_call(i: int, kv_tiles: int, grid_rows: int):
        """One pallas_call covering q row-blocks [i, i+grid_rows) with a
        static kv extent of ``kv_tiles`` tiles (grid_rows > 1 only when
        every covered row has the same extent, i.e. non-causal)."""
        span = kv_tiles * block_kv
        kern = functools.partial(
            _kernel, block_kv=block_kv, q_row0=i * block_q, causal=causal,
            int8_qk=int8_qk, has_kbias=k_bias is not None,
        )
        out_shape = [
            jax.ShapeDtypeStruct((b, h, grid_rows * block_q, d), v.dtype)
        ]
        out_specs = [
            pl.BlockSpec(
                (1, 1, block_q, d), lambda b_, h_, r: (b_, h_, r, 0)
            )
        ]
        if save_lse:
            out_shape.append(
                jax.ShapeDtypeStruct(
                    (b, h, grid_rows * block_q, 128), jnp.float32
                )
            )
            out_specs.append(
                pl.BlockSpec(
                    (1, 1, block_q, 128), lambda b_, h_, r: (b_, h_, r, 0)
                )
            )
        in_specs = [
            pl.BlockSpec(
                (1, 1, block_q, d),
                lambda b_, h_, r, i=i: (b_, h_, i + r, 0),
            ),
            pl.BlockSpec(
                (1, 1, span, d), lambda b_, h_, r: (b_, h_ // group, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, span, d), lambda b_, h_, r: (b_, h_ // group, 0, 0)
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        inputs = [qt, kt, vt, scale_arr]
        if k_bias is not None:
            # (B, 1, Skv): the singleton second-minor dim satisfies
            # Mosaic's block-shape rule (must divide 8 or equal the
            # array dim).
            in_specs.append(
                pl.BlockSpec((1, 1, span), lambda b_, h_, r: (b_, 0, 0))
            )
            inputs.append(k_bias.astype(jnp.float32)[:, None, :])
        res = pl.pallas_call(
            kern,
            grid=(b, h, grid_rows),
            in_specs=in_specs,
            out_specs=out_specs if save_lse else out_specs[0],
            out_shape=out_shape if save_lse else out_shape[0],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            ),
            interpret=interp,
        )(*inputs)
        return res if save_lse else (res, None)

    if not causal:
        out, lse = one_call(0, n_kv_total, n_q)
    else:
        # Triangular: causal q_row0 in the kernel is per-call static, so
        # each row-block gets its own call with exactly its extent.
        outs, lses = [], []
        for i in range(n_q):
            kv_tiles = min(
                (i * block_q + block_q + block_kv - 1) // block_kv,
                n_kv_total,
            )
            o_i, lse_i = one_call(i, kv_tiles, 1)
            outs.append(o_i)
            lses.append(lse_i)
        out = jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]
        lse = (
            (jnp.concatenate(lses, axis=2) if len(lses) > 1 else lses[0])
            if save_lse
            else None
        )
    out = out.astype(q.dtype) if not int8_qk else out.astype(v.dtype)
    if save_lse:
        return out, lse[..., 0]  # lane-replicated -> (B, H, S)
    return out, None


def flash_attention_unrolled(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    int8_qk: bool = False,
    k_bias: Optional[jax.Array] = None,  # (B, Skv) fp32 per-key bias
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Unrolled-KV flash forward. (B, S, H, D) -> (B, S, H, D).

    See the module docstring for scope and measured wins. Raises
    ValueError outside `unrolled_supported()`'s envelope — callers
    (engine registry) gate eligibility first.
    """
    out, _ = unrolled_fwd_bhsd(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        causal=causal,
        sm_scale=sm_scale,
        block_q=block_q,
        block_kv=block_kv,
        int8_qk=int8_qk,
        k_bias=k_bias,
        interpret=interpret,
    )
    return out.transpose(0, 2, 1, 3)


def flash_attention_best(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """INFERENCE dispatch: the unrolled kernel when the measured envelope
    admits the geometry, the grid kernel otherwise.

    Serving prefill paths call this instead of flash_attention directly
    (models/gpt2_serving.py etc.) — prompts at 512-multiples ride the
    1.3-1.5x unrolled kernels, everything else falls back. Forward-only
    (no custom VJP): training modules keep ops/flash.py.
    """
    from .flash import flash_attention

    s, d = q.shape[1], q.shape[3]
    if q.shape[1] == k.shape[1] and unrolled_supported(s, d):
        return flash_attention_unrolled(
            q, k, v, causal=causal, sm_scale=sm_scale, interpret=interpret
        )
    return flash_attention(
        q, k, v, causal=causal, sm_scale=sm_scale, interpret=interpret
    )
