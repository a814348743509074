"""Scaling: request load balancing + autoscaling decisions."""

from .autoscaler import AutoScalingOrchestrator, MetricSample, ScalingDecision
from .load_balancer import BackendNode, ConsistentHashRing, LoadBalancer

__all__ = [
    "AutoScalingOrchestrator",
    "BackendNode",
    "ConsistentHashRing",
    "LoadBalancer",
    "MetricSample",
    "ScalingDecision",
]
