"""Fixed-capacity KV cache containers (functional pytrees).

Reference parity (re-designed for XLA static shapes):
- KVCache: cache/kv_cache/cache.py:7-148 (step-grown contiguous cache) ->
  fixed-capacity [L, B, S, H, D] buffers, in-place via buffer donation.
- RotatingKVCache: cache/kv_cache/rotating.py:6-284 (sliding window with
  in-place rotate) -> same buffers with ``slot = position % capacity``
  writes and position-based masks; no data movement on rotation.
- QuantizedKVCache: cache/kv_cache/quantized.py:7-206 (group-quantized
  storage) -> int8 storage with per-(token, head) scales, matching the
  native core's page layout (reference include/engine/page.hpp:104-117:
  int8 KV + per-head scales; channel-wise noted as TODO there).
- save/load: cache/kv_cache/__init__.py:163-210 safetensors persistence.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("k", "v", "slot_positions", "length"),
    meta_fields=("window",),
)
@dataclasses.dataclass(frozen=True)
class KVCache:
    """Contiguous (window=None) or rotating (window=capacity) KV cache.

    k, v: [L, B, S, Hkv, Dh]
    slot_positions: [B, S] global position held by each slot (-1 = empty)
    length: [B] number of tokens written (NOT clamped to capacity)
    window: sliding-window size; None = full attention
    """

    k: jax.Array
    v: jax.Array
    slot_positions: jax.Array
    length: jax.Array
    window: Optional[int] = None

    @classmethod
    def create(
        cls,
        num_layers: int,
        batch: int,
        capacity: int,
        num_kv_heads: int,
        head_dim: int,
        dtype=jnp.bfloat16,
        window: Optional[int] = None,
    ) -> "KVCache":
        shape = (num_layers, batch, capacity, num_kv_heads, head_dim)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            slot_positions=jnp.full((batch, capacity), -1, jnp.int32),
            length=jnp.zeros((batch,), jnp.int32),
            window=window,
        )

    @property
    def capacity(self) -> int:
        return self.k.shape[2]

    def trim_capacity(self, bucket: int) -> "KVCache":
        """Capacity-bucketed VIEW for short-context decode: attention over
        a [.., :bucket] slice instead of the full buffer (a 1024-capacity
        bf16 8B cache costs ~134 MB of reads per decoded token; at ctx 192
        a 256 bucket reads a quarter of that). Caller guarantees every
        position this view serves is < bucket; merge back with
        merge_trimmed."""
        return dataclasses.replace(
            self,
            k=self.k[:, :, :bucket],
            v=self.v[:, :, :bucket],
            slot_positions=self.slot_positions[:, :bucket],
        )

    def merge_trimmed(self, t: "KVCache") -> "KVCache":
        b = t.capacity
        return dataclasses.replace(
            self,
            k=self.k.at[:, :, :b].set(t.k),
            v=self.v.at[:, :, :b].set(t.v),
            slot_positions=self.slot_positions.at[:, :b].set(
                t.slot_positions
            ),
            length=t.length,
        )

    def write_slot(self, positions: jax.Array) -> jax.Array:
        """Slot index for a global position (identity, or modulo when
        rotating)."""
        if self.window is None:
            return positions
        return positions % self.capacity

    def advance(
        self, first_pos: jax.Array, num_tokens: int, valid_lens=None
    ) -> "KVCache":
        """Return cache metadata updated for ``num_tokens`` written starting
        at per-sequence global position ``first_pos`` [B]. (k/v arrays are
        updated inside the model forward; this updates bookkeeping.)

        ``valid_lens`` [B]: real tokens per row in this chunk (the rest are
        bucket pads). Rotating caches MUST be told — a pad slot aliases a
        live slot once positions wrap, and recording the pad would scrub a
        real entry's metadata. Contiguous caches only gain precision (pads
        beyond valid_lens are not recorded, so trim_to has nothing to undo).
        """
        b, s = self.slot_positions.shape
        new_pos = first_pos[:, None] + jnp.arange(num_tokens)[None, :]
        slots = self.write_slot(new_pos)
        drop = None
        if valid_lens is not None:
            drop = jnp.arange(num_tokens)[None, :] >= valid_lens[:, None]
        if self.window is not None and num_tokens > 1:
            # rotating: a chunk longer than capacity self-aliases; only the
            # last ``capacity`` valid tokens may record their slots
            end = first_pos + (
                valid_lens if valid_lens is not None else num_tokens
            )
            stale = new_pos < (end - self.capacity)[:, None]
            drop = stale if drop is None else (drop | stale)
        if drop is not None:
            slots = jnp.where(drop, s, slots)  # out of bounds -> dropped
        slot_positions = self.slot_positions.at[
            jnp.arange(b)[:, None], slots
        ].set(new_pos, mode="drop")
        end_len = first_pos + (
            valid_lens if valid_lens is not None else num_tokens
        )
        return dataclasses.replace(
            self,
            slot_positions=slot_positions,
            length=jnp.maximum(self.length, end_len),
        )

    def trim_to(self, length: jax.Array) -> "KVCache":
        """Logically trim each sequence to ``length`` tokens (prefix reuse:
        reference ReusableKVCache.reuse, cache/kv_cache/reusable.py:8-254 —
        here a metadata-only operation)."""
        b, s = self.slot_positions.shape
        keep = self.slot_positions < length[:, None]
        return dataclasses.replace(
            self,
            slot_positions=jnp.where(keep, self.slot_positions, -1),
            length=jnp.minimum(self.length, length),
        )


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("k_q", "k_scale", "v_q", "v_scale", "slot_positions", "length"),
    meta_fields=("window",),
)
@dataclasses.dataclass(frozen=True)
class QuantizedKVCache:
    """INT8 KV cache with per-(token, head) scales (symmetric).

    k_q, v_q: [L, B, S, Hkv, Dh] int8; k_scale, v_scale: [L, B, S, Hkv, 1] f32.
    """

    k_q: jax.Array
    k_scale: jax.Array
    v_q: jax.Array
    v_scale: jax.Array
    slot_positions: jax.Array
    length: jax.Array
    window: Optional[int] = None

    def trim_capacity(self, bucket: int) -> "QuantizedKVCache":
        """See KVCache.trim_capacity."""
        return dataclasses.replace(
            self,
            k_q=self.k_q[:, :, :bucket],
            k_scale=self.k_scale[:, :, :bucket],
            v_q=self.v_q[:, :, :bucket],
            v_scale=self.v_scale[:, :, :bucket],
            slot_positions=self.slot_positions[:, :bucket],
        )

    def merge_trimmed(self, t: "QuantizedKVCache") -> "QuantizedKVCache":
        b = t.capacity
        return dataclasses.replace(
            self,
            k_q=self.k_q.at[:, :, :b].set(t.k_q),
            k_scale=self.k_scale.at[:, :, :b].set(t.k_scale),
            v_q=self.v_q.at[:, :, :b].set(t.v_q),
            v_scale=self.v_scale.at[:, :, :b].set(t.v_scale),
            slot_positions=self.slot_positions.at[:, :b].set(
                t.slot_positions
            ),
            length=t.length,
        )

    @classmethod
    def create(
        cls,
        num_layers: int,
        batch: int,
        capacity: int,
        num_kv_heads: int,
        head_dim: int,
        dtype=jnp.bfloat16,
        window: Optional[int] = None,
    ) -> "QuantizedKVCache":
        shape = (num_layers, batch, capacity, num_kv_heads, head_dim)
        sshape = (num_layers, batch, capacity, num_kv_heads, 1)
        return cls(
            k_q=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(sshape, jnp.float32),
            v_q=jnp.zeros(shape, jnp.int8),
            v_scale=jnp.zeros(sshape, jnp.float32),
            slot_positions=jnp.full((batch, capacity), -1, jnp.int32),
            length=jnp.zeros((batch,), jnp.int32),
            window=window,
        )

    @property
    def capacity(self) -> int:
        return self.k_q.shape[2]

    write_slot = KVCache.write_slot
    advance = KVCache.advance
    trim_to = KVCache.trim_to


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("sliding", "full"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class DualKVCache:
    """Two cache groups for models that interleave sliding-window and
    global-attention layers (gemma-3's 5:1 pattern): the sliding group's
    storage is bounded at the window size — the rotating-buffer memory bound
    of the reference's RotatingKVCache (cache/kv_cache/rotating.py:115-167)
    with XLA-static shapes — while only the global group pays max_len.

    ``sliding``: KVCache/QuantizedKVCache with L = #sliding layers,
    capacity = min(window, max_len), window set (rotating slots).
    ``full``: same class with L = #global layers, capacity = max_len.
    """

    sliding: object
    full: object

    @property
    def window(self):
        return self.sliding.window

    @property
    def slot_positions(self):  # engine bookkeeping looks at the full group
        return self.full.slot_positions

    @property
    def length(self):
        return self.full.length

    def advance(self, first_pos, num_tokens, valid_lens=None):
        return DualKVCache(
            sliding=self.sliding.advance(first_pos, num_tokens, valid_lens),
            full=self.full.advance(first_pos, num_tokens, valid_lens),
        )

    def trim_to(self, length):
        return DualKVCache(
            sliding=self.sliding.trim_to(length),
            full=self.full.trim_to(length),
        )


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization per (token, head): x [B, T, H, D] ->
    (q int8, scale f32 [B, T, H, 1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return q, scale


def dequantize_kv(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def make_kv_cache(
    num_layers: int,
    batch: int,
    capacity: int,
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    window: Optional[int] = None,
    quantized: bool = False,
):
    """Factory mirroring reference make_kv_cache (cache/kv_cache/__init__.py:
    10-62): window -> rotating behavior; quantized -> int8 storage."""
    cls = QuantizedKVCache if quantized else KVCache
    return cls.create(
        num_layers, batch, capacity, num_kv_heads, head_dim, dtype, window
    )


def maybe_quantize(
    cache: KVCache, threshold_tokens: int = 4096
) -> "KVCache | QuantizedKVCache":
    """Convert a bf16 cache to INT8 storage once any sequence crosses the
    token threshold (reference cache/kv_cache/__init__.py:241-265
    maybe_quantize: convert-after-threshold for long contexts)."""
    import numpy as np

    if isinstance(cache, DualKVCache):
        return DualKVCache(
            sliding=maybe_quantize(cache.sliding, threshold_tokens),
            full=maybe_quantize(cache.full, threshold_tokens),
        )
    if isinstance(cache, QuantizedKVCache):
        return cache
    if int(np.max(np.asarray(cache.length))) < threshold_tokens:
        return cache
    k_q, k_scale = quantize_kv(cache.k)
    v_q, v_scale = quantize_kv(cache.v)
    return QuantizedKVCache(
        k_q=k_q,
        k_scale=k_scale,
        v_q=v_q,
        v_scale=v_scale,
        slot_positions=cache.slot_positions,
        length=cache.length,
        window=cache.window,
    )
