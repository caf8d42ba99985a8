"""Aux subsystems: maybe_quantize, profiling zones, heartbeat liveness,
scheduler drain."""

import time

import numpy as np
import jax.numpy as jnp

from pie_tpu.cache.kv_cache import KVCache, QuantizedKVCache, maybe_quantize


def test_maybe_quantize_threshold():
    c = KVCache.create(2, 1, 8, 2, 4, jnp.bfloat16)
    c = c.advance(jnp.zeros((1,), jnp.int32), 3)
    assert maybe_quantize(c, threshold_tokens=10) is c  # below threshold
    q = maybe_quantize(c, threshold_tokens=2)
    assert isinstance(q, QuantizedKVCache)
    assert maybe_quantize(q, threshold_tokens=2) is q  # idempotent


def test_profiling_zones(monkeypatch):
    from pie_tpu.utils import profiling

    monkeypatch.setattr(profiling, "ENABLED", True)
    profiling.reset_zones()
    with profiling.zone("work"):
        time.sleep(0.01)
    rep = profiling.zone_report()
    assert rep["work"]["count"] == 1
    assert rep["work"]["mean_ms"] >= 5


def test_heartbeat_liveness(tmp_path):
    from pie_tpu.parallel.distributed import Heartbeat

    a = Heartbeat(tmp_path, "host-a", interval=0.05, timeout=0.2)
    b = Heartbeat(tmp_path, "host-b", interval=0.05, timeout=0.2)
    a.beat()
    b.beat()
    assert "host-b" in a.peers()
    assert a.dead_peers() == []
    time.sleep(0.3)  # b stops beating
    a.beat()
    assert a.dead_peers() == ["host-b"]
    a.stop()
    b.stop()


def test_profiled_allocator_passthrough():
    from pie_tpu.runtime import PageAllocator
    from pie_tpu.utils.profiling import ProfiledAllocator

    a = ProfiledAllocator(PageAllocator(4, native=False))
    pid = a.allocate()
    assert pid >= 0
    assert a.num_free() == 3
    a.free(pid)
    assert a.num_free() == 4
