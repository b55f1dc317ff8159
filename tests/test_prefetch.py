"""Prefetcher: ordering, prepare-on-worker, exception propagation, early
close, bounded lookahead. (TPU-native stand-in for DataLoader workers —
see lvv_tpu/data/prefetch.py.)"""
import threading
import time

import pytest

from lvv_tpu.data import Prefetcher


def test_order_and_prepare():
    out = list(Prefetcher(range(10), prepare=lambda x: x * x, depth=3))
    assert out == [i * i for i in range(10)]


def test_prepare_runs_on_worker_thread():
    tids = []

    def prep(x):
        tids.append(threading.get_ident())
        return x

    list(Prefetcher(range(3), prepare=prep))
    assert all(t != threading.get_ident() for t in tids)


def test_exception_propagates_at_next():
    def gen():
        yield 1
        raise ValueError("boom")

    it = Prefetcher(gen())
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)
    with pytest.raises(StopIteration):    # iterator is dead afterwards
        next(it)


def test_prepare_exception_propagates():
    it = Prefetcher([1, 2], prepare=lambda x: 1 // (x - 1))
    with pytest.raises(ZeroDivisionError):
        list(it)


def test_early_close_unblocks_worker():
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = Prefetcher(gen(), depth=2)
    assert next(it) == 0
    it.close()                              # worker parked on a full queue
    assert len(produced) < 1000             # lookahead was bounded
    with pytest.raises(StopIteration):
        next(it)


def test_bounded_lookahead():
    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield i

    with Prefetcher(gen(), depth=2) as it:
        next(it)
        time.sleep(0.2)                     # give the worker time to run on
        assert len(produced) <= 5           # depth 2 + in-flight slack


def test_empty_source():
    assert list(Prefetcher([])) == []


def test_depth_validation():
    with pytest.raises(ValueError):
        Prefetcher([1], depth=0)
