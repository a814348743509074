"""Llama model family on the TPU attention engine.

Llama is in the reference converter's family-detection list (reference
integration/pytorch/convert.py — ``_detect_family`` probes for
"llama") but has no weight-transfer branch there; this module completes
the surface with a native Flax implementation plus exact HF transfer.
Architecturally it exercises the engine features GPT-2/BERT/T5 do not:

* **grouped-query attention** — runs on the flash kernel's native GQA
  index maps (no repeated KV in HBM),
* **rotary position embeddings** (half-split rotate convention, matching
  HF ``apply_rotary_pos_emb``),
* RMSNorm pre-normalization and SwiGLU MLP, all bias-free.

TPU idioms as elsewhere: ``nn.scan`` layer stack, bf16 compute over fp32
params, tensor-parallel PartitionSpec rules.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .attention import dispatch_attention


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    max_position_embeddings: int = 4096
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def llama2_7b(cls) -> "LlamaConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "LlamaConfig":
        """For tests/dryruns (GQA: 8 q heads over 2 kv heads)."""
        return cls(
            vocab_size=512,
            hidden_size=128,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=8,
            num_key_value_heads=2,
            max_position_embeddings=256,
        )


class RMSNorm(nn.Module):
    epsilon: float = 1e-6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + self.epsilon) * scale).astype(self.dtype)


def rope_cos_sin(
    positions: jax.Array, head_dim: int, theta: float
) -> Tuple[jax.Array, jax.Array]:
    """(B, S) int positions -> cos/sin (B, S, head_dim) fp32, HF layout
    (frequencies duplicated across the two halves)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (B, S, D/2)
    emb = jnp.concatenate([angles, angles], axis=-1)  # (B, S, D)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Half-split rotation (HF ``rotate_half``): x is (B, S, H, D)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[:, :, None, :].astype(jnp.float32)
    sin = sin[:, :, None, :].astype(jnp.float32)
    out = x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin
    return out.astype(x.dtype)


class LlamaAttention(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(
        self, x: jax.Array, positions: jax.Array, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        cfg = self.config
        b, s, _ = x.shape
        hd = cfg.head_dim
        dense = lambda feats, name: nn.Dense(  # noqa: E731
            feats, use_bias=False, dtype=cfg.dtype, name=name
        )
        q = dense(cfg.num_attention_heads * hd, "q_proj")(x)
        k = dense(cfg.num_key_value_heads * hd, "k_proj")(x)
        v = dense(cfg.num_key_value_heads * hd, "v_proj")(x)
        q = q.reshape(b, s, cfg.num_attention_heads, hd)
        k = k.reshape(b, s, cfg.num_key_value_heads, hd)
        v = v.reshape(b, s, cfg.num_key_value_heads, hd)

        cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        out, _ = dispatch_attention(q, k, v, mask, causal=True)
        out = out.reshape(b, s, cfg.num_attention_heads * hd)
        return dense(cfg.hidden_size, "o_proj")(out)


class LlamaMLP(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        dense = lambda feats, name: nn.Dense(  # noqa: E731
            feats, use_bias=False, dtype=cfg.dtype, name=name
        )
        gate = nn.silu(dense(cfg.intermediate_size, "gate_proj")(x))
        up = dense(cfg.intermediate_size, "up_proj")(x)
        return dense(cfg.hidden_size, "down_proj")(gate * up)


class LlamaLayer(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(
        self, x: jax.Array, positions: jax.Array, mask: Optional[jax.Array]
    ) -> jax.Array:
        cfg = self.config
        h = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="input_ln")(x)
        x = x + LlamaAttention(cfg, name="attn")(h, positions, mask)
        h = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="post_attn_ln")(x)
        return x + LlamaMLP(cfg, name="mlp")(h)


class _ScanLayer(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x, positions, mask):
        return LlamaLayer(self.config, name="layer")(x, positions, mask), None


class LlamaForCausalLM(nn.Module):
    """Llama with LM head. Input: int32 (B, S) token ids."""

    config: LlamaConfig
    scan_layers: bool = True

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        *,
        positions: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        b, s = input_ids.shape
        embed = self.param(
            "embed_tokens",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.hidden_size),
            jnp.float32,
        )
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
        mask = None
        if attention_mask is not None:
            keep = attention_mask.astype(bool)[:, None, None, :]
            mask = jnp.broadcast_to(keep, (b, 1, s, s))
        x = embed.astype(cfg.dtype)[input_ids]
        if self.scan_layers:
            scanned = nn.scan(
                _ScanLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=cfg.num_hidden_layers,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(cfg, name="layers")
            x, _ = scanned(x, positions, mask)
        else:
            for i in range(cfg.num_hidden_layers):
                x = LlamaLayer(cfg, name=f"layer_{i}")(x, positions, mask)
        x = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="norm")(x)
        if cfg.tie_word_embeddings:
            return x @ embed.astype(cfg.dtype).T
        head = self.param(
            "lm_head",
            nn.initializers.normal(0.02),
            (cfg.hidden_size, cfg.vocab_size),
            jnp.float32,
        )
        return x @ head.astype(cfg.dtype)


def llama_param_sharding_rules(params: Dict, mesh_axes=("data", "model")):
    """TP PartitionSpecs: q/k/v/gate/up column-sharded, o/down row-sharded,
    embeddings sharded on hidden."""
    _, model = mesh_axes

    def rule(names: Tuple[str, ...], leaf) -> P:
        name = "/".join(names)
        base = None
        if any(f"{p}/kernel" in name for p in ("q_proj", "k_proj", "v_proj")):
            base = (None, model)
        elif "o_proj/kernel" in name or "down_proj/kernel" in name:
            base = (model, None)
        elif "gate_proj/kernel" in name or "up_proj/kernel" in name:
            base = (None, model)
        elif name.endswith("embed_tokens") or name.endswith("lm_head"):
            base = (None, model)
        if base is None or leaf.ndim < 2:
            return P()
        return P(*((None,) * (leaf.ndim - 2) + base))

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_names(kp):
        return tuple(
            getattr(e, "key", getattr(e, "idx", str(e))) for e in kp
        )

    specs = {path_names(kp): rule(tuple(map(str, path_names(kp))), leaf) for kp, leaf in flat}

    def build(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: build(v, prefix + (k,)) for k, v in tree.items()}
        return specs[prefix]

    return build(params)


def _t(w):
    import numpy as np

    return np.asarray(w).T


def transfer_hf_llama(hf_model: Any, dtype=jnp.bfloat16) -> Tuple[Any, Dict, Any]:
    """Weight transfer from a loaded HF (torch) LlamaForCausalLM/LlamaModel."""
    import numpy as np

    sd = {k: np.asarray(v.detach()) for k, v in hf_model.state_dict().items()}
    if not any(k.startswith("model.") for k in sd):
        sd = {f"model.{k}": v for k, v in sd.items()}
    hf_cfg = hf_model.config
    tie = bool(getattr(hf_cfg, "tie_word_embeddings", False))
    has_head = "lm_head.weight" in sd
    cfg = LlamaConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        num_key_value_heads=getattr(
            hf_cfg, "num_key_value_heads", hf_cfg.num_attention_heads
        ),
        max_position_embeddings=hf_cfg.max_position_embeddings,
        rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
        rms_norm_eps=hf_cfg.rms_norm_eps,
        tie_word_embeddings=tie or not has_head,
        dtype=dtype,
    )
    params: Dict[str, Any] = {"embed_tokens": sd["model.embed_tokens.weight"]}
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        layers.append(
            {
                "input_ln": {"scale": sd[p + "input_layernorm.weight"]},
                "post_attn_ln": {"scale": sd[p + "post_attention_layernorm.weight"]},
                "attn": {
                    "q_proj": {"kernel": _t(sd[p + "self_attn.q_proj.weight"])},
                    "k_proj": {"kernel": _t(sd[p + "self_attn.k_proj.weight"])},
                    "v_proj": {"kernel": _t(sd[p + "self_attn.v_proj.weight"])},
                    "o_proj": {"kernel": _t(sd[p + "self_attn.o_proj.weight"])},
                },
                "mlp": {
                    "gate_proj": {"kernel": _t(sd[p + "mlp.gate_proj.weight"])},
                    "up_proj": {"kernel": _t(sd[p + "mlp.up_proj.weight"])},
                    "down_proj": {"kernel": _t(sd[p + "mlp.down_proj.weight"])},
                },
            }
        )
    params["layers"] = {
        "layer": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers)
    }
    params["norm"] = {"scale": sd["model.norm.weight"]}
    if has_head and not cfg.tie_word_embeddings:
        params["lm_head"] = _t(sd["lm_head.weight"])
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), params)
    return LlamaForCausalLM(cfg), {"params": params}, cfg


def load_hf_llama(model_name: str, dtype=jnp.bfloat16):
    """Load HF Llama weights into this implementation."""
    from transformers import AutoModelForCausalLM

    return transfer_hf_llama(AutoModelForCausalLM.from_pretrained(model_name), dtype)
