"""Cross-request prompt caching: in-memory prefix reuse + disk persistence.

Reference parity: cache/prompt_cache.py:13-167 — track computed_ids, find
the common token prefix, reuse the cache for the prefix and prefill only the
suffix; persist caches to safetensors keyed by SHA-256 of the token ids.
On TPU the "reuse" is a metadata trim (KVCache.trim_to) — the fixed-capacity
buffers stay put.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import logging
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pie_tpu.cache.kv_cache import DualKVCache, KVCache, QuantizedKVCache

logger = logging.getLogger(__name__)

_CACHE_CLASSES = {"KVCache": KVCache, "QuantizedKVCache": QuantizedKVCache}
_DUAL_GROUPS = ("sliding", "full")


def common_prefix_len(a: Sequence[int], b: Sequence[int]) -> int:
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    return n


class PromptCache:
    """Per-engine prompt cache (reference PromptCache.__call__/reuse_cache)."""

    def __init__(self, cache_dir: Optional[str | Path] = None):
        self.computed_ids: list[int] = []
        self.cache_dir = Path(cache_dir) if cache_dir else None
        if self.cache_dir:
            self.cache_dir.mkdir(parents=True, exist_ok=True)

    def reuse_prefix(self, prompt_ids: Sequence[int]) -> int:
        """Returns the number of leading prompt tokens whose KV is already
        in the engine cache; always leaves >= 1 token to prefill (the last
        token's logits must be recomputed — reference prompt_cache.py:52-76)."""
        cp = common_prefix_len(self.computed_ids, prompt_ids)
        return max(0, min(cp, len(prompt_ids) - 1))

    def update(self, ids: Sequence[int]):
        self.computed_ids = list(ids)

    def reset(self):
        self.computed_ids = []

    # -- disk persistence (reference cache_prompt/load_cached_prompt) -----

    @staticmethod
    def prompt_hash(ids: Sequence[int]) -> str:
        h = hashlib.sha256()
        h.update(np.asarray(list(ids), np.int64).tobytes())
        return h.hexdigest()

    def cache_path(self, ids: Sequence[int]) -> Optional[Path]:
        if not self.cache_dir:
            return None
        return self.cache_dir / f"{self.prompt_hash(ids)}.safetensors"

    def save_prompt(self, ids: Sequence[int], cache) -> Optional[Path]:
        path = self.cache_path(ids)
        if path is None:
            return None
        save_cache(cache, path, extra_meta={"computed_ids": list(map(int, ids))})
        return path

    def load_prompt(self, ids: Sequence[int]):
        """Returns (cache, computed_ids) or None on miss."""
        path = self.cache_path(ids)
        if path is None or not path.exists():
            return None
        cache, meta = load_cache(path)
        return cache, meta.get("computed_ids", [])


# ---------------------------------------------------------------------------
# cache (de)serialization — reference BaseCache.save_cache/load_cache,
# cache/kv_cache/__init__.py:163-210
# ---------------------------------------------------------------------------


def _collect_tensors(cache, tensors, meta, prefix=""):
    for f in dataclasses.fields(cache):
        v = getattr(cache, f.name)
        if isinstance(v, (jax.Array, np.ndarray)):
            name = prefix + f.name
            tensors[name] = np.asarray(
                v.astype(jnp.float32) if v.dtype == jnp.bfloat16 else v
            )
            if v.dtype == jnp.bfloat16:
                meta.setdefault("bf16_fields", []).append(name)


def save_cache(cache, path: str | Path, extra_meta: Optional[dict] = None):
    from safetensors.numpy import save_file

    tensors = {}
    meta = {"cache_class": type(cache).__name__}
    if extra_meta:
        meta.update(extra_meta)
    if isinstance(cache, DualKVCache):
        for group in _DUAL_GROUPS:
            sub = getattr(cache, group)
            meta[group + "_class"] = type(sub).__name__
            meta[group + "_window"] = sub.window
            _collect_tensors(sub, tensors, meta, group + ".")
    else:
        meta["window"] = cache.window
        _collect_tensors(cache, tensors, meta)
    save_file(tensors, str(path), metadata={"pie": json.dumps(meta)})


def _build_cache(cls, data, bf16, window, prefix=""):
    kwargs = {}
    for f in dataclasses.fields(cls):
        name = prefix + f.name
        if name in data:
            arr = jnp.asarray(data[name])
            if name in bf16:
                arr = arr.astype(jnp.bfloat16)
            kwargs[f.name] = arr
    kwargs["window"] = window
    return cls(**kwargs)


def load_cache(path: str | Path):
    from safetensors.numpy import load_file
    from safetensors import safe_open

    with safe_open(str(path), framework="np") as f:
        meta = json.loads((f.metadata() or {}).get("pie", "{}"))
    data = load_file(str(path))
    bf16 = set(meta.get("bf16_fields", []))
    if meta.get("cache_class") == "DualKVCache":
        groups = {
            g: _build_cache(
                _CACHE_CLASSES[meta.get(g + "_class", "KVCache")],
                data, bf16, meta.get(g + "_window"), g + ".",
            )
            for g in _DUAL_GROUPS
        }
        return DualKVCache(**groups), meta
    cls = _CACHE_CLASSES[meta.get("cache_class", "KVCache")]
    return _build_cache(cls, data, bf16, meta.get("window")), meta
