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


def test_qwen2vl_image_processor_matches_hf():
    """Patchify layout must be bit-compatible with HF's
    Qwen2VLImageProcessor (the vision tower was parity-tested against HF
    on exactly that layout)."""
    import numpy as np
    import pytest

    transformers = pytest.importorskip("transformers")
    pytest.importorskip("transformers.models.qwen2_vl")
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from pie_tpu.vision.utils import Qwen2VLImageProcessor

    rng = np.random.default_rng(0)
    img = Image.fromarray(
        rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
    )
    ours = Qwen2VLImageProcessor(image_size=224)
    pixels, grid = ours.batch([img])

    hf = transformers.models.qwen2_vl.image_processing_qwen2_vl.Qwen2VLImageProcessor(
        do_resize=True,
        min_pixels=224 * 224,
        max_pixels=224 * 224,
        patch_size=14,
        merge_size=2,
        temporal_patch_size=2,
    )
    out = hf(images=[img], return_tensors="np")
    np.testing.assert_array_equal(grid, out["image_grid_thw"])
    np.testing.assert_allclose(
        pixels, out["pixel_values"], atol=2e-2, rtol=2e-2
    )
