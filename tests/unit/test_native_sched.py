"""Native (C++) request scheduler and its Python twin.

Contract parity tests run against BOTH implementations (reference's
priority task queue semantics, scaling/distributed_computing.py:252-379:
FIFO within priority, higher priority first, wait accounting).
"""

import pytest

from photonic_flash_attention_tpu.core.native_sched import (
    NativeRequestScheduler,
    PyRequestScheduler,
    native_available,
)


def _impls():
    impls = [PyRequestScheduler]
    if native_available():
        impls.append(NativeRequestScheduler)
    return impls


@pytest.fixture(params=_impls(), ids=lambda c: c.__name__)
def sched(request):
    return request.param()


class TestScheduler:
    def test_fifo_within_priority(self, sched):
        for sid in (1, 2, 3):
            sched.submit(sid, priority=0)
        assert sched.peek() == 1
        assert sched.pop(1)
        assert sched.peek() == 2

    def test_priority_order(self, sched):
        sched.submit(1, priority=0)
        sched.submit(2, priority=5)
        sched.submit(3, priority=5)
        assert sched.peek() == 2  # highest priority, FIFO within
        sched.pop(2)
        assert sched.peek() == 3
        sched.pop(3)
        assert sched.peek() == 1

    def test_pop_non_head_fails(self, sched):
        sched.submit(1)
        sched.submit(2)
        assert not sched.pop(2)
        assert sched.pop(1)

    def test_cancel(self, sched):
        sched.submit(1)
        sched.submit(2)
        assert sched.cancel(1)
        assert not sched.cancel(99)
        assert sched.peek() == 2
        assert len(sched) == 1

    def test_waiting_ids_order(self, sched):
        sched.submit(10, priority=1)
        sched.submit(11, priority=0)
        sched.submit(12, priority=1)
        assert sched.waiting_ids() == [10, 12, 11]

    def test_stats(self, sched):
        sched.submit(1)
        sched.submit(2)
        sched.pop(1)
        sched.cancel(2)
        st = sched.stats()
        assert st["waiting"] == 0
        assert st["admitted"] == 1
        assert st["cancelled"] == 1
        assert st["wait_p50_us"] >= 0
        assert st["wait_max_us"] >= st["wait_p50_us"]

    def test_empty(self, sched):
        assert sched.peek() is None
        assert len(sched) == 0
        assert sched.stats()["waiting"] == 0


def test_native_builds():
    """The native library must build in CI (g++ is a baked-in dep)."""
    assert native_available()
