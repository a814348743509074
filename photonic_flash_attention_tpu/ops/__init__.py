"""Compute kernels: flash attention, fused short-seq, quantization, paging."""

from .flash import flash_attention
from .fused import fused_attention
from .quantization import (
    QuantizedTensor,
    dequantize,
    quantization_error,
    quantize,
    quantize_kv,
)
from .reference import attention_blockwise, attention_reference

__all__ = [
    "QuantizedTensor",
    "attention_blockwise",
    "attention_reference",
    "dequantize",
    "flash_attention",
    "fused_attention",
    "quantization_error",
    "quantize",
    "quantize_kv",
]
