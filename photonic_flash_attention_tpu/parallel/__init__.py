"""Distribution: mesh construction, ring attention, sharded wrappers."""

from .mesh import AXIS_DATA, AXIS_MODEL, AXIS_SEQ, create_mesh
from .ring import make_ring_attention, ring_attention, softmax_merge

__all__ = [
    "AXIS_DATA",
    "AXIS_MODEL",
    "AXIS_SEQ",
    "create_mesh",
    "make_ring_attention",
    "ring_attention",
    "softmax_merge",
]
