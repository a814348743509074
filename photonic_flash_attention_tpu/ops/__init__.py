"""Compute kernels: flash attention, fused short-seq, quantization, paging."""

from .flash import flash_attention
from .flash_unrolled import (
    flash_attention_best,
    flash_attention_unrolled,
    unrolled_supported,
)
from .flash_fp8 import (
    flash_attention_fp8,
    flash_attention_fp8qk,
    flash_attention_int8,
    flash_attention_int8full,
    flash_attention_int8qk,
    flash_attention_quant,
)
from .fused import fused_attention
from .nonlinearity import (
    NonlinearityType,
    apply_nonlinearity,
    fused_layer_norm,
    fused_rms_norm,
    fused_softmax,
)
from .rel_bias import ALiBi, T5RelBias, alibi_slopes, materialize
from .quantization import (
    QuantizedTensor,
    dequantize,
    quantization_error,
    quantize,
    quantize_kv,
)
from .reference import attention_blockwise, attention_reference

__all__ = [
    "ALiBi",
    "NonlinearityType",
    "QuantizedTensor",
    "apply_nonlinearity",
    "fused_layer_norm",
    "fused_rms_norm",
    "fused_softmax",
    "T5RelBias",
    "alibi_slopes",
    "materialize",
    "attention_blockwise",
    "attention_reference",
    "dequantize",
    "flash_attention",
    "flash_attention_best",
    "flash_attention_unrolled",
    "unrolled_supported",
    "flash_attention_fp8",
    "flash_attention_fp8qk",
    "flash_attention_int8",
    "flash_attention_int8full",
    "flash_attention_int8qk",
    "flash_attention_quant",
    "fused_attention",
    "quantization_error",
    "quantize",
    "quantize_kv",
]
