"""Foundation utilities: logging, exceptions, validation, monitoring."""

from .exceptions import (
    CalibrationError,
    CompilationError,
    ComputationError,
    ConfigurationError,
    DistributionError,
    HardwareError,
    KVCacheError,
    MemoryError_,
    PhotonicFlashAttentionError,
    SecurityError,
    TimeoutError_,
    ValidationError,
)
from .logging import PerformanceLogger, get_logger, setup_logging
from .monitoring import MetricRegistry, MetricRing, device_memory_stats, get_metrics
from .validation import (
    normalize_mask,
    pad_to_multiple,
    validate_attention_inputs,
    validate_block_config,
    validate_quant_mode,
)

__all__ = [
    "CalibrationError",
    "CompilationError",
    "ComputationError",
    "ConfigurationError",
    "DistributionError",
    "HardwareError",
    "KVCacheError",
    "MemoryError_",
    "MetricRegistry",
    "MetricRing",
    "PerformanceLogger",
    "PhotonicFlashAttentionError",
    "SecurityError",
    "TimeoutError_",
    "ValidationError",
    "device_memory_stats",
    "get_logger",
    "get_metrics",
    "normalize_mask",
    "pad_to_multiple",
    "setup_logging",
    "validate_attention_inputs",
    "validate_block_config",
    "validate_quant_mode",
]
