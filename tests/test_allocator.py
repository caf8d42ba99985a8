"""Python-side allocator binding tests (native + fallback), mirroring the
reference's C++ allocator test coverage from the Python API."""

import threading

import pytest

from pie_tpu.runtime import PageAllocator, TOKENS_PER_PAGE


@pytest.fixture(params=["native", "python"])
def alloc_factory(request):
    native = request.param == "native"
    if native:
        from pie_tpu.runtime.allocator import load_native

        if load_native() is None:
            pytest.skip("native library unavailable")

    def make(n, shards=0):
        return PageAllocator(n, shards, native=native)

    return make


def test_tokens_per_page_constant():
    assert TOKENS_PER_PAGE == 64


def test_exhaustion_and_uniqueness(alloc_factory):
    a = alloc_factory(16)
    ids = [a.allocate() for _ in range(16)]
    assert sorted(ids) == list(range(16))
    assert a.allocate() == -1
    assert a.num_free() == 0
    for i in ids:
        a.free(i)
    assert a.num_free() == 16


def test_refcount_sharing(alloc_factory):
    a = alloc_factory(4)
    pid = a.allocate()
    a.add_ref(pid)
    assert a.ref_count(pid) == 2
    a.free(pid)
    assert a.ref_count(pid) == 1
    assert a.num_free() == 3
    a.free(pid)
    assert a.num_free() == 4


def test_allocate_n_all_or_nothing(alloc_factory):
    a = alloc_factory(8)
    got = a.allocate_n(6)
    assert len(got) == 6
    assert a.allocate_n(4) == []  # only 2 left -> rollback
    assert a.num_free() == 2
    for p in got:
        a.free(p)


def test_double_free_raises(alloc_factory):
    a = alloc_factory(4)
    pid = a.allocate()
    a.free(pid)
    with pytest.raises(ValueError):
        a.free(pid)


def test_threaded_churn(alloc_factory):
    a = alloc_factory(256)
    errors = []

    def worker():
        try:
            mine = []
            for _ in range(2000):
                pid = a.allocate()
                if pid >= 0:
                    mine.append(pid)
                if len(mine) > 8:
                    a.free(mine.pop(0))
            for p in mine:
                a.free(p)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert a.num_free() == 256
