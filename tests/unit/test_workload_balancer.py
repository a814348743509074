"""Cluster task scheduler (reference DistributedWorkloadBalancer
scaling/distributed_computing.py:65-802): placement, heartbeats,
failure requeue, priorities."""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from photonic_flash_attention_tpu.scaling.workload_balancer import (
    ComputeNode,
    DistributedTask,
    DistributedWorkloadBalancer,
    PlacementStrategy,
    TaskState,
)
from photonic_flash_attention_tpu.utils.exceptions import DistributionError


def echo_executor(task):
    return task.payload.get("x", 0) * 2


class TestPlacement:
    def test_round_robin_spreads(self):
        b = DistributedWorkloadBalancer(strategy=PlacementStrategy.ROUND_ROBIN)
        for i in range(3):
            b.register_node(ComputeNode(f"n{i}", executor=echo_executor))
        for i in range(9):
            b.submit_task(DistributedTask(f"t{i}", payload={"x": i}))
        b.run_until_drained()
        status = b.get_cluster_status()
        counts = [n["completed"] for n in status["nodes"].values()]
        assert sum(counts) == 9
        assert all(c == 3 for c in counts)

    def test_performance_aware_prefers_tpu_for_long_seq(self):
        b = DistributedWorkloadBalancer(
            strategy=PlacementStrategy.PERFORMANCE_AWARE
        )
        b.register_node(ComputeNode("cpu0", device_type="cpu", executor=echo_executor))
        b.register_node(ComputeNode("tpu0", device_type="tpu", executor=echo_executor))
        b.submit_task(DistributedTask("long", seq_length=4096, payload={"x": 1}))
        b.run_until_drained()
        assert b._tasks["long"].assigned_node == "tpu0"

    def test_priority_order(self):
        order = []

        def rec(task):
            order.append(task.task_id)
            return None

        b = DistributedWorkloadBalancer()
        b.register_node(ComputeNode("n0", capacity=1, executor=rec))
        b.submit_task(DistributedTask("low", priority=0))
        b.submit_task(DistributedTask("high", priority=10))
        b.submit_task(DistributedTask("mid", priority=5))
        b.run_until_drained()
        assert order == ["high", "mid", "low"]


class TestFailureHandling:
    def test_heartbeat_timeout_requeues(self):
        b = DistributedWorkloadBalancer(heartbeat_timeout_s=0.05)
        good = ComputeNode("good", executor=echo_executor)
        b.register_node(good)
        # Simulate a task stuck RUNNING on a dead node.
        dead = ComputeNode("dead", executor=echo_executor)
        b.register_node(dead)
        t = DistributedTask("t0", payload={"x": 3})
        b.submit_task(t)
        t.state = TaskState.RUNNING
        t.assigned_node = "dead"
        dead.active_tasks = 1
        dead.last_heartbeat = time.time() - 1.0
        good.last_heartbeat = time.time() + 100  # keep alive

        failed = b.check_heartbeats()
        assert failed == ["dead"]
        assert t.state == TaskState.QUEUED
        b.run_until_drained()
        assert t.state == TaskState.DONE
        assert t.assigned_node == "good"
        assert t.result == 6

    def test_heartbeat_recovers_node(self):
        b = DistributedWorkloadBalancer(heartbeat_timeout_s=0.01)
        n = ComputeNode("n0", executor=echo_executor)
        b.register_node(n)
        n.last_heartbeat = time.time() - 1.0
        b.check_heartbeats()
        assert n.failed
        b.heartbeat("n0")
        assert not n.failed

    def test_failing_task_retries_then_fails(self):
        calls = []

        def flaky(task):
            calls.append(1)
            raise RuntimeError("boom")

        b = DistributedWorkloadBalancer()
        b.register_node(ComputeNode("n0", executor=flaky))
        t = DistributedTask("t0")
        b.submit_task(t)
        b.run_until_drained()
        assert t.state == TaskState.FAILED
        assert len(calls) == b.MAX_ATTEMPTS
        assert "boom" in t.error

    def test_duplicate_task_rejected(self):
        b = DistributedWorkloadBalancer()
        b.register_node(ComputeNode("n0", executor=echo_executor))
        b.submit_task(DistributedTask("t0"))
        with pytest.raises(DistributionError):
            b.submit_task(DistributedTask("t0"))


class TestAttentionExecution:
    def test_attention_task_through_engine(self, rng):
        from photonic_flash_attention_tpu.core.engine import reset_engine
        from photonic_flash_attention_tpu.ops.reference import attention_reference

        reset_engine()
        b = DistributedWorkloadBalancer()
        b.register_node(ComputeNode("local"))  # default local_engine_executor
        q = jnp.asarray(rng.standard_normal((1, 128, 4, 32)), jnp.float32)
        t = DistributedTask(
            "attn", kind="attention",
            payload={"q": q, "k": q, "v": q, "causal": True},
            seq_length=128,
        )
        b.submit_task(t)
        b.run_until_drained()
        assert t.state == TaskState.DONE
        ref, _ = attention_reference(q, q, q, causal=True)
        np.testing.assert_allclose(
            np.asarray(t.result, np.float32), np.asarray(ref), atol=2e-2
        )
        reset_engine()

    def test_background_loop(self):
        b = DistributedWorkloadBalancer()
        b.register_node(ComputeNode("n0", executor=echo_executor))
        b.start(tick_s=0.01)
        t = DistributedTask("t0", payload={"x": 21})
        b.submit_task(t)
        deadline = time.time() + 5
        while t.state != TaskState.DONE and time.time() < deadline:
            time.sleep(0.02)
        b.stop()
        assert t.result == 42

    def test_status_surface(self):
        b = DistributedWorkloadBalancer()
        b.register_node(ComputeNode("n0", executor=echo_executor))
        b.submit_task(DistributedTask("t0", payload={"x": 1}))
        b.run_until_drained()
        s = b.get_cluster_status()
        assert s["tasks"]["done"] == 1
        assert s["nodes"]["n0"]["completed"] == 1
