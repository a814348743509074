"""photonic_flash_attention_tpu — a TPU-native attention engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference ``danieleschmidt/Photonic-Flash-Attention``: a hybrid-kernel
attention engine (fused short-seq / flash-tiled / quantized / paged-decode
/ ring) with an adaptive measured-latency router, an HBM paged KV-cache,
drop-in module APIs with HF-model conversion, and real multi-chip
distribution over a ``jax.sharding.Mesh``.

What the reference *simulates* (analog low-precision compute, E/O/E
conversion, crossover dispatch), this package makes *real* as quantized
TPU kernels with a measured cost model; what the reference *fakes*
(distribution), this package implements with XLA collectives.
"""

from .config import GlobalConfig, get_config, reset_config, set_global_config

__version__ = "0.1.0"

__all__ = [
    "GlobalConfig",
    "get_config",
    "reset_config",
    "set_global_config",
    "__version__",
]


def __getattr__(name):
    # Lazy re-exports keep `import photonic_flash_attention_tpu` light.
    if name in (
        "flash_attention",
        "flash_attention_fp8",
        "flash_attention_fp8qk",
        "flash_attention_int8",
        "flash_attention_int8full",
        "flash_attention_int8qk",
        "flash_attention_quant",
        "fused_attention",
    ):
        from . import ops

        return getattr(ops, name)
    if name in ("PhotonicFlashAttention", "PhotonicMultiHeadAttention"):
        from . import models

        return getattr(models, name)
    if name == "convert_to_photonic":
        from .models import convert_to_photonic

        return convert_to_photonic
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
