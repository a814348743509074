"""Native (C++) page allocator: parity with the Python allocator contract."""

import threading

import pytest

from photonic_flash_attention_tpu.core.native_alloc import (
    NativePageAllocator,
    native_available,
)
from photonic_flash_attention_tpu.utils.exceptions import KVCacheError

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native allocator not built (no g++?)"
)


def make(num_pages=16, page_size=16, max_pages=8):
    return NativePageAllocator(num_pages, page_size, max_pages)


class TestNativeAllocator:
    def test_trash_page_reserved(self):
        a = make(num_pages=4)
        s = a.allocate_sequence(3 * 16)  # 3 pages from a pool of 4-1
        assert 0 not in a.page_ids(s)
        assert a.stats()["pages_used"] == 3

    def test_alloc_extend_free_cycle(self):
        a = make()
        s = a.allocate_sequence(20)  # 2 pages
        assert len(a.page_ids(s)) == 2
        a.extend(s, 40)  # 3 pages total
        assert len(a.page_ids(s)) == 3
        a.set_length(s, 33)
        assert a.length(s) == 33
        a.free_sequence(s)
        st = a.stats()
        assert st["pages_used"] == 0
        assert st["free_count"] == 3

    def test_oom(self):
        a = make(num_pages=3)  # 2 usable (page 0 trash)
        a.allocate_sequence(2 * 16)
        with pytest.raises(KVCacheError):
            a.allocate_sequence(16)
        assert a.stats()["oom_events"] == 1

    def test_per_seq_cap(self):
        a = make(num_pages=64, max_pages=2)
        with pytest.raises(KVCacheError):
            a.allocate_sequence(3 * 16)

    def test_unknown_sequence(self):
        a = make()
        with pytest.raises(KVCacheError):
            a.free_sequence(99)
        with pytest.raises(KVCacheError):
            a.page_ids(99)

    def test_pages_exclusive_across_sequences(self):
        a = make(num_pages=32)
        s1 = a.allocate_sequence(4 * 16)
        s2 = a.allocate_sequence(4 * 16)
        assert not set(a.page_ids(s1)) & set(a.page_ids(s2))

    def test_recycling_reuses_pages(self):
        a = make(num_pages=4)
        s1 = a.allocate_sequence(3 * 16)
        pages1 = set(a.page_ids(s1))
        a.free_sequence(s1)
        s2 = a.allocate_sequence(3 * 16)
        assert set(a.page_ids(s2)) == pages1

    def test_thread_safety(self):
        a = make(num_pages=256, max_pages=4)
        errors = []

        def worker():
            try:
                for _ in range(50):
                    s = a.allocate_sequence(2 * 16)
                    a.extend(s, 3 * 16)
                    a.free_sequence(s)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=worker) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert a.stats()["pages_used"] == 0
