"""KV cache family: contiguous, rotating (sliding-window), quantized, paged
pool, and cross-request prompt caching.

Reference parity: cache/kv_cache/__init__.py:10-265 (BaseCache ABC +
make_kv_cache/save/load/maybe_quantize), re-designed as functional pytree
containers with fixed capacities (TPU static shapes) instead of growable
per-request cache objects.
"""

from pie_tpu.cache.kv_cache import (
    DualKVCache,
    KVCache,
    QuantizedKVCache,
    make_kv_cache,
)
