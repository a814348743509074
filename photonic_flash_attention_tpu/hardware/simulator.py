"""Design-space simulators: kernel pipeline + ICI topology.

The TPU rebirth of the reference's two standalone simulators:

* the device-physics circuit sandbox (reference
  photonic/simulation/circuit.py:25-665 — S-matrix component models,
  frequency sweeps, design optimization) becomes
  :class:`KernelPipelineSimulator`, which models the thing a TPU kernel
  author actually sweeps: the Mosaic double-buffered pipeline. Per grid
  cell it accounts DMA-in bytes vs MXU/VPU compute time, checks VMEM
  feasibility, and predicts latency per (block_q, block_kv) candidate —
  the "frequency sweep" of kernel design space, and the analytic prior
  behind the autotuner's measured sweep.
* the photonic NoC simulator (reference
  photonic/optical_kernels/interconnect.py:26-559 — topologies,
  Floyd-Warshall routing tables, congestion stats) becomes
  :class:`TopologySimulator`: 1D/2D/3D torus hop-distance model with
  per-collective cost prediction (psum / all_gather / reduce_scatter /
  ppermute / all_to_all) over ICI links — the costs `shard_map`
  placements actually pay.

Both are predictive tools; measured numbers always win (the router and
autotuner treat these as priors/bounds only).
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, List, Optional, Sequence, Tuple

from .detection import TPUCapabilities
from .roofline import _caps

_DTYPE_BYTES = {"bf16": 2, "fp16": 2, "f32": 4, "fp8": 1, "int8": 1}
_LANE = 128
# VPU throughput relative to MXU for elementwise fp32 work: the 8x128x8
# VPU does ~2 orders of magnitude fewer FLOP/s than the MXU.
_VPU_FRACTION_OF_PEAK = 1.0 / 64.0


@dataclasses.dataclass
class PipelinePrediction:
    block_q: int
    block_kv: int
    grid_cells: int
    vmem_bytes: int
    feasible: bool
    t_dma_us_per_cell: float
    t_mxu_us_per_cell: float
    t_vpu_us_per_cell: float
    t_total_us: float

    @property
    def bound(self) -> str:
        t = max(self.t_dma_us_per_cell, self.t_mxu_us_per_cell, self.t_vpu_us_per_cell)
        if t == self.t_dma_us_per_cell:
            return "dma"
        return "mxu" if t == self.t_mxu_us_per_cell else "vpu"

    def as_dict(self) -> Dict:
        return {**dataclasses.asdict(self), "bound": self.bound}


class KernelPipelineSimulator:
    """Predict flash-kernel latency per (block_q, block_kv) design point.

    Model: the Mosaic pipeline overlaps tile DMA with compute, so each
    grid cell costs ``max(t_dma, t_mxu + t_vpu)`` in steady state plus a
    one-cell fill. Per cell (one q-tile x kv-tile step):

    * DMA in: the kv tile every cell; the q tile once per kv sweep
      (amortized 1/num_kv_blocks).
    * MXU: QK^T (2*bq*bkv*d) + PV (2*bq*bkv*d) FLOPs.
    * VPU: online-softmax elementwise work, ~8 ops per score element.
    """

    def __init__(
        self,
        caps: Optional[TPUCapabilities] = None,
        vmem_budget_fraction: float = 0.5,
    ) -> None:
        self.caps = _caps(caps)
        self.vmem_budget = self.caps.vmem_mb * 1e6 * vmem_budget_fraction

    def predict(
        self,
        batch: int,
        q_len: int,
        kv_len: int,
        num_heads: int,
        head_dim: int,
        block_q: int,
        block_kv: int,
        *,
        causal: bool = False,
        dtype: str = "bf16",
    ) -> PipelinePrediction:
        c = self.caps
        b = _DTYPE_BYTES[dtype]
        d = max(head_dim, 64)

        num_q = -(-q_len // block_q)
        num_kv = -(-kv_len // block_kv)
        cells = batch * num_heads * num_q * num_kv
        if causal and q_len == kv_len:
            cells = max(1, cells // 2)  # future blocks skipped

        # VMEM working set: double-buffered q/k/v tiles + fp32 scratch.
        vmem = 2 * (
            block_q * d * b  # q
            + 2 * block_kv * d * b  # k + v
        ) + block_q * (2 * _LANE + d) * 4  # m, l, acc scratch
        feasible = vmem <= self.vmem_budget

        # Per-cell times.
        dma_bytes = 2 * block_kv * d * b + (block_q * d * b) / max(num_kv, 1)
        t_dma = dma_bytes / (c.hbm_gbps * 1e9) * 1e6

        mxu_flops = 4.0 * block_q * block_kv * d
        mxu_eff = min(1.0, head_dim / _LANE)
        # Small tiles underfill the pipeline: ramp efficiency with rows.
        mxu_eff *= min(1.0, block_q / 256.0)
        t_mxu = mxu_flops / (c.bf16_tflops * 1e12 * mxu_eff) * 1e6

        # Elementwise softmax work on the score tile plus the online-
        # softmax bookkeeping (max/sum reduction, accumulator rescale):
        # the bookkeeping is per-cell O(block_q * d), so small kv blocks
        # pay it more often per unit of useful work.
        vpu_ops = 8.0 * block_q * block_kv + 6.0 * block_q * d
        t_vpu = vpu_ops / (c.bf16_tflops * 1e12 * _VPU_FRACTION_OF_PEAK) * 1e6

        # Fixed per-cell cost: scalar-core loop iteration, DMA descriptor
        # issue, pipeline prologue work.
        t_fixed = 0.1
        t_cell = max(t_dma, t_mxu + t_vpu) + t_fixed
        total = (cells + 1) * t_cell  # +1 pipeline fill
        return PipelinePrediction(
            block_q, block_kv, cells, int(vmem), feasible, t_dma, t_mxu, t_vpu, total
        )

    def sweep(
        self,
        batch: int,
        q_len: int,
        kv_len: int,
        num_heads: int,
        head_dim: int,
        *,
        causal: bool = False,
        dtype: str = "bf16",
        block_qs: Sequence[int] = (128, 256, 512, 1024),
        block_kvs: Sequence[int] = (128, 256, 512, 1024, 2048),
    ) -> List[PipelinePrediction]:
        """Design-space sweep; feasible points sorted fastest-first."""
        preds = [
            self.predict(
                batch, q_len, kv_len, num_heads, head_dim,
                bq, bkv, causal=causal, dtype=dtype,
            )
            for bq, bkv in itertools.product(block_qs, block_kvs)
            if bq <= max(_LANE, q_len) and bkv <= max(_LANE, kv_len)
        ]
        feasible = [p for p in preds if p.feasible]
        return sorted(feasible or preds, key=lambda p: p.t_total_us)

    def best(self, *args, **kwargs) -> PipelinePrediction:
        return self.sweep(*args, **kwargs)[0]


# ---------------------------------------------------------------------------
# ICI topology
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CollectiveCost:
    collective: str
    bytes_per_device: float
    t_us: float
    hops: int
    links_used: int


class TopologySimulator:
    """ICI torus model with per-collective cost prediction.

    TPU pods wire chips as 1D rings / 2D / 3D tori; bandwidth-optimal
    collectives decompose into ring phases per axis. Costs follow the
    standard ring-algorithm forms (the public scaling-book recipe):

    * psum (all-reduce): 2 * (n-1)/n * bytes per axis, fully pipelined.
    * all_gather / reduce_scatter: (n-1)/n * bytes per axis.
    * ppermute: one neighbor hop, bytes moved once.
    * all_to_all: (n-1)/n * bytes, bisection-limited.

    The reference's Floyd-Warshall routing table (interconnect.py:381-413)
    is replaced by the torus' closed-form hop distances.
    """

    def __init__(
        self,
        mesh_shape: Sequence[int],
        caps: Optional[TPUCapabilities] = None,
        wrap: bool = True,
    ) -> None:
        self.shape = tuple(int(s) for s in mesh_shape)
        self.caps = _caps(caps)
        self.wrap = wrap
        self.num_devices = 1
        for s in self.shape:
            self.num_devices *= s

    def hop_distance(self, a: Sequence[int], b: Sequence[int]) -> int:
        """Manhattan distance on the (wrapped) torus."""
        total = 0
        for x, y, s in zip(a, b, self.shape):
            d = abs(x - y)
            if self.wrap and s > 2:
                d = min(d, s - d)
            total += d
        return total

    def max_hops(self) -> int:
        """Network diameter (worst-case point-to-point hops)."""
        return sum((s // 2 if self.wrap and s > 2 else s - 1) for s in self.shape)

    def _axis_bw(self) -> float:
        # bidirectional per-link bandwidth in bytes/s
        return self.caps.ici_gbps * 1e9

    def collective_cost(
        self, collective: str, bytes_per_device: float, axes: Optional[Sequence[int]] = None
    ) -> CollectiveCost:
        """Predict one collective's time over the given mesh axes
        (default: all axes)."""
        axes = list(range(len(self.shape))) if axes is None else list(axes)
        n = 1
        for ax in axes:
            n *= self.shape[ax]
        bw = self._axis_bw()
        frac = (n - 1) / max(n, 1)
        if collective == "psum":
            moved = 2.0 * frac * bytes_per_device
            hops = 2 * (n - 1)
        elif collective in ("all_gather", "reduce_scatter"):
            moved = frac * bytes_per_device
            hops = n - 1
        elif collective == "ppermute":
            moved = bytes_per_device
            hops = 1
        elif collective == "all_to_all":
            moved = frac * bytes_per_device
            hops = n - 1
        else:
            raise ValueError(f"unknown collective {collective!r}")
        # Torus rings are bidirectional: two directions halve the time.
        t_us = moved / (2.0 * bw) * 1e6 if self.wrap else moved / bw * 1e6
        return CollectiveCost(collective, bytes_per_device, t_us, hops, len(axes))

    def ring_attention_overlap(
        self,
        batch: int,
        local_seq: int,
        num_heads: int,
        head_dim: int,
        axis: int = 0,
        *,
        dtype: str = "bf16",
    ) -> Dict:
        """Compute-vs-ppermute overlap for ring attention on one axis
        (the >=85% scaling-efficiency gate's analytic form)."""
        from .roofline import attention_prefill_cost

        comp = attention_prefill_cost(
            batch, local_seq, local_seq, num_heads, head_dim,
            dtype=dtype, caps=self.caps,
        )
        kv_bytes = 2.0 * batch * num_heads * local_seq * head_dim * _DTYPE_BYTES[dtype]
        comm = self.collective_cost("ppermute", kv_bytes, axes=[axis])
        n = self.shape[axis]
        t_step = max(comp.t_roofline_us, comm.t_us)
        ideal = n * comp.t_roofline_us
        return {
            "steps": n,
            "t_compute_us": comp.t_roofline_us,
            "t_ppermute_us": comm.t_us,
            "comm_hidden": comp.t_roofline_us >= comm.t_us,
            "t_total_us": n * t_step,
            "scaling_efficiency": ideal / max(n * t_step, 1e-9),
        }

    def describe(self) -> Dict:
        return {
            "shape": self.shape,
            "devices": self.num_devices,
            "wrap": self.wrap,
            "diameter_hops": self.max_hops(),
            "ici_gbps_per_link": self.caps.ici_gbps,
        }
