"""GPT-2 model family on the TPU attention engine (the flagship E2E model).

The reference converts HF GPT-2 by swapping its attention layers
(reference integration/pytorch/convert.py:174-202 GPT-2 config extraction,
:399-430 fused-c_attn weight transfer); BASELINE.json names GPT-2-medium
as the E2E target. Here GPT-2 is implemented natively in Flax on
``PhotonicFlashAttention``, with exact HF weight-loading support
(``load_hf_gpt2``) so converted checkpoints produce identical logits.

Sharding: ``param_sharding_rules`` returns a PartitionSpec tree for
tensor-parallel (attention heads + MLP) × data-parallel execution over a
``Mesh`` — the real version of the reference's simulated distribution.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .attention import PhotonicFlashAttention


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5
    #: dropout on attention probabilities (HF attn_pdrop) — train mode
    #: only; applied in-kernel on the flash path (ops/flash.py).
    attn_pdrop: float = 0.0
    dtype: Any = jnp.bfloat16

    @classmethod
    def small(cls) -> "GPT2Config":
        return cls()

    @classmethod
    def medium(cls) -> "GPT2Config":
        return cls(n_embd=1024, n_layer=24, n_head=16)

    @classmethod
    def large(cls) -> "GPT2Config":
        return cls(n_embd=1280, n_layer=36, n_head=20)

    @classmethod
    def tiny(cls) -> "GPT2Config":
        """For tests/dryruns."""
        return cls(vocab_size=1024, n_positions=256, n_embd=128, n_layer=2, n_head=4)


class MLP(nn.Module):
    config: GPT2Config

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        h = nn.Dense(4 * cfg.n_embd, dtype=cfg.dtype, name="c_fc")(x)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(cfg.n_embd, dtype=cfg.dtype, name="c_proj")(h)


class Block(nn.Module):
    config: GPT2Config

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=cfg.dtype, name="ln_1")(x)
        attn_out, _ = PhotonicFlashAttention(
            embed_dim=cfg.n_embd,
            num_heads=cfg.n_head,
            causal=True,
            attention_dropout=cfg.attn_pdrop,
            dtype=cfg.dtype,
            adaptive=False,  # in-model calls are traced; static dispatch
            name="attn",
        )(h, deterministic=deterministic)
        x = x + attn_out
        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=cfg.dtype, name="ln_2")(x)
        return x + MLP(cfg, name="mlp")(h)


class _ScanBlock(nn.Module):
    """Scan-compatible wrapper: (carry, _) -> (carry, None)."""

    config: GPT2Config
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, _unused) -> Tuple[jax.Array, None]:
        return Block(self.config, name="block")(x, self.deterministic), None


class GPT2LMHead(nn.Module):
    """GPT-2 with tied-embedding LM head. Input: int32 (B, S) token ids.

    ``scan_layers=True`` (default) runs the transformer stack as one
    ``nn.scan`` over stacked layer params — the compiled program contains
    a single block body instead of ``n_layer`` unrolled copies, cutting
    compile time/HLO size ~n_layer-fold (idiomatic TPU/XLA practice).
    Layer params then carry a leading (n_layer,) axis.
    """

    config: GPT2Config
    scan_layers: bool = True

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        *,
        deterministic: bool = True,
        positions: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        b, s = input_ids.shape
        wte = self.param(
            "wte",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.n_embd),
            jnp.float32,
        )
        wpe = self.param(
            "wpe",
            nn.initializers.normal(0.01),
            (cfg.n_positions, cfg.n_embd),
            jnp.float32,
        )
        if positions is None:
            positions = jnp.arange(s, dtype=jnp.int32)[None, :]
        x = wte.astype(cfg.dtype)[input_ids] + wpe.astype(cfg.dtype)[positions]
        if self.scan_layers:
            scanned = nn.scan(
                _ScanBlock,
                variable_axes={"params": 0},
                # Each layer draws its own dropout stream (ignored when no
                # 'dropout' rng is provided, i.e. deterministic runs).
                split_rngs={"params": True, "dropout": True},
                length=cfg.n_layer,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(cfg, deterministic, name="h")
            x, _ = scanned(x, None)
        else:
            for i in range(cfg.n_layer):
                x = Block(cfg, name=f"h_{i}")(x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=cfg.dtype, name="ln_f")(x)
        logits = x @ wte.astype(cfg.dtype).T  # tied head
        return logits


def param_sharding_rules(params: Dict, mesh_axes: Tuple[str, str] = ("data", "model")):
    """PartitionSpec tree for TP×DP over ('data','model') mesh axes.

    Tensor-parallel layout (the SNIPPETS.md §1 head-sharding pattern):
    q/k/v projections column-sharded (heads on 'model'), out/c_proj
    row-sharded, MLP c_fc column- and c_proj row-sharded, embeddings
    vocab-replicated with n_embd sharding on wte for memory.
    """
    _, model = mesh_axes

    def rule(path: Tuple[str, ...], leaf) -> P:
        name = "/".join(str(p) for p in path)
        # Base spec for the trailing (in, out) dims of a kernel; scanned
        # layer stacks carry a leading (n_layer,) axis padded with None.
        base = None
        if "q_proj/kernel" in name or "k_proj/kernel" in name or "v_proj/kernel" in name:
            base = (None, model)  # column parallel (heads)
        elif "out_proj/kernel" in name:
            base = (model, None)  # row parallel
        elif "c_fc/kernel" in name:
            base = (None, model)
        elif "c_proj/kernel" in name:
            base = (model, None)
        elif name.endswith("wte"):
            base = (None, model)
        if base is None or leaf.ndim < 2:
            return P()  # biases, layernorm params, wpe: replicated
        return P(*((None,) * (leaf.ndim - 2) + base))

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_to_names(kp):
        out = []
        for entry in kp:
            if hasattr(entry, "key"):
                out.append(entry.key)
            elif hasattr(entry, "idx"):
                out.append(str(entry.idx))
            else:
                out.append(str(entry))
        return tuple(out)

    specs = {path_to_names(kp): rule(path_to_names(kp), leaf) for kp, leaf in flat}

    def build(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: build(v, prefix + (k,)) for k, v in tree.items()}
        return specs[prefix]

    return build(params)


def load_hf_gpt2(model_name: str = "gpt2", dtype=jnp.bfloat16):
    """Load HF GPT-2 weights into this implementation (downloads weights)."""
    from transformers import GPT2LMHeadModel

    return transfer_hf_gpt2(GPT2LMHeadModel.from_pretrained(model_name), dtype)


def transfer_hf_gpt2(hf, dtype=jnp.bfloat16):
    """Transfer weights from an already-constructed HF GPT-2 (no network).

    Handles the fused ``c_attn`` QKV split the reference handles in
    ``_transfer_weights`` (convert.py:399-430): HF GPT-2 uses Conv1D
    ((in, out) kernels, no transpose needed for flax Dense) with QKV
    concatenated on the output axis. Accepts ``GPT2LMHeadModel`` or bare
    ``GPT2Model`` (state-dict keys are normalized to the ``transformer.``
    prefix).
    """
    import numpy as np

    sd = {k: np.asarray(v.detach()) for k, v in hf.state_dict().items()}
    # LMHead checkpoints prefix with 'transformer.', bare GPT2Model doesn't.
    if not any(k.startswith("transformer.") for k in sd):
        sd = {f"transformer.{k}": v for k, v in sd.items()}
    hf_cfg = hf.config
    cfg = GPT2Config(
        vocab_size=hf_cfg.vocab_size,
        n_positions=hf_cfg.n_positions,
        n_embd=hf_cfg.n_embd,
        n_layer=hf_cfg.n_layer,
        n_head=hf_cfg.n_head,
        dtype=dtype,
    )
    params: Dict[str, Any] = {
        "wte": sd["transformer.wte.weight"],
        "wpe": sd["transformer.wpe.weight"],
        "ln_f": {
            "scale": sd["transformer.ln_f.weight"],
            "bias": sd["transformer.ln_f.bias"],
        },
    }
    layers = []
    for i in range(cfg.n_layer):
        p = f"transformer.h.{i}."
        c_attn_w = sd[p + "attn.c_attn.weight"]  # (E, 3E) Conv1D layout
        c_attn_b = sd[p + "attn.c_attn.bias"]
        qw, kw, vw = np.split(c_attn_w, 3, axis=1)
        qb, kb, vb = np.split(c_attn_b, 3, axis=0)
        layers.append(
            {
                "ln_1": {"scale": sd[p + "ln_1.weight"], "bias": sd[p + "ln_1.bias"]},
                "ln_2": {"scale": sd[p + "ln_2.weight"], "bias": sd[p + "ln_2.bias"]},
                "attn": {
                    "q_proj": {"kernel": qw, "bias": qb},
                    "k_proj": {"kernel": kw, "bias": kb},
                    "v_proj": {"kernel": vw, "bias": vb},
                    "out_proj": {
                        "kernel": sd[p + "attn.c_proj.weight"],
                        "bias": sd[p + "attn.c_proj.bias"],
                    },
                },
                "mlp": {
                    "c_fc": {
                        "kernel": sd[p + "mlp.c_fc.weight"],
                        "bias": sd[p + "mlp.c_fc.bias"],
                    },
                    "c_proj": {
                        "kernel": sd[p + "mlp.c_proj.weight"],
                        "bias": sd[p + "mlp.c_proj.bias"],
                    },
                },
            }
        )
    # Stack per-layer trees along the scan axis: h/block/... -> (L, ...).
    params["h"] = {
        "block": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers)
    }
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), params)
    return GPT2LMHead(cfg), {"params": params}, cfg
