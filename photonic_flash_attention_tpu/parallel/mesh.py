"""Device-mesh construction and axis conventions.

The real replacement for the reference's *named-but-never-initialized*
distributed backend (reference scaling/distributed_computing.py:98-99
names nccl/gloo/tensorpipe; ``init_process_group`` is never called).
Axis convention (SURVEY.md §2.5): ``data`` (batch/DP), ``model``
(heads/TP), ``seq`` (sequence/ring CP).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import get_config
from ..utils.exceptions import DistributionError

AXIS_DATA = "data"
AXIS_MODEL = "model"
AXIS_SEQ = "seq"


def create_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = (AXIS_DATA, AXIS_MODEL),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over available devices.

    ``shape=None`` puts every device on the first axis. A ``-1`` entry is
    inferred from the device count (like reshape).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    shape = list(shape)
    if shape.count(-1) > 1:
        raise DistributionError("at most one -1 axis allowed")
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        if n % known:
            raise DistributionError(f"{n} devices not divisible by {known}")
        shape[shape.index(-1)] = n // known
    if int(np.prod(shape)) != n:
        raise DistributionError(
            f"mesh shape {tuple(shape)} does not cover {n} devices"
        )
    if len(shape) != len(axis_names):
        raise DistributionError(
            f"shape rank {len(shape)} != axis_names {len(axis_names)}"
        )
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def default_axis_names() -> Tuple[str, str, str]:
    cfg = get_config()
    return (cfg.mesh_data_axis, cfg.mesh_seq_axis, cfg.mesh_model_axis)
