"""Distribution: mesh construction, ring/Ulysses attention, pipeline, sharded wrappers."""

from .mesh import AXIS_DATA, AXIS_MODEL, AXIS_SEQ, create_mesh
from .pipeline import make_pipeline
from .ring import make_ring_attention, ring_attention, softmax_merge
from .ulysses import make_ulysses_attention, ulysses_attention

__all__ = [
    "AXIS_DATA",
    "AXIS_MODEL",
    "AXIS_SEQ",
    "create_mesh",
    "make_pipeline",
    "make_ring_attention",
    "make_ulysses_attention",
    "ring_attention",
    "softmax_merge",
    "ulysses_attention",
]
