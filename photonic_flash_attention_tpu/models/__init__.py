"""Model integration: drop-in modules, GPT-2 family, HF conversion."""

from .attention import (
    PhotonicFlashAttention,
    PhotonicMultiHeadAttention,
    dispatch_attention,
)
from .convert import (
    AttentionLayerDetector,
    ConversionReport,
    PhotonicConfig,
    convert_to_photonic,
)
from .gpt2 import GPT2Config, GPT2LMHead, load_hf_gpt2, param_sharding_rules

__all__ = [
    "AttentionLayerDetector",
    "ConversionReport",
    "GPT2Config",
    "GPT2LMHead",
    "PhotonicConfig",
    "PhotonicFlashAttention",
    "PhotonicMultiHeadAttention",
    "convert_to_photonic",
    "dispatch_attention",
    "load_hf_gpt2",
    "param_sharding_rules",
]
