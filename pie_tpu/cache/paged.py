"""Paged KV cache pool: device-side pool pytree + host-side page-table
manager.

Reference parity: the *intended* pie_core design that was never finished —
KVPage 64-token pages with refcounts (include/engine/page.hpp:14-117),
PageAllocator (src/engine/page_allocator.cpp), per-sequence page tables
(include/sequence/sequence.hpp:31-79), consolidated block tables co-designed
with the attention kernel (include/engine/batch_details.hpp:53-65).

TPU-first: the pool is one global HBM array per K/V ([L, P, Hkv, page, Dh] —
head-major so the attention kernel's per-head tiles are leading-dim slices
with clean (page x head_dim) sublane/lane tiling at any head_dim),
sequences own page-id lists handed out by the (C++-backed) PageAllocator, and
batches address the pool through fixed-shape block tables [B, max_pages].
INT8 KV uses per-(token, head) scales like the reference page layout.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from pie_tpu.runtime import PageAllocator, TOKENS_PER_PAGE

PAGE_SIZE = TOKENS_PER_PAGE


def fold_for(head_dim: int) -> int:
    """Tokens packed per 128-lane pool row ("fold"): Mosaic requires DMA'd
    page blocks to have 128-aligned minor dims, so for head_dim < 128 the
    attention kernel views each page as [Hkv*(PAGE/f), f*head_dim] with
    f = 128//head_dim tokens per row (free bitcast of the natural layout).
    Falls back to 1 (XLA attention path) when head_dim doesn't divide 128."""
    if head_dim < 128 and 128 % head_dim == 0 and PAGE_SIZE % (
        128 // head_dim
    ) == 0:
        return 128 // head_dim
    return 1


def unpermute_page_scales(s: jax.Array) -> jax.Array:
    """Phase-major pool scales [..., f, Hkv, PAGE//f] -> natural
    [..., Hkv, PAGE, 1] (token t of head h lives at [t % f, h, t // f])."""
    f, hkv, rows = s.shape[-3:]
    lead = s.shape[:-3]
    s = jnp.moveaxis(s, -3, -1)  # [..., Hkv, rows, f]
    return s.reshape(*lead, hkv, rows * f, 1)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("k", "v", "k_scale", "v_scale"),
    meta_fields=("quantized", "fold"),
)
@dataclasses.dataclass(frozen=True)
class PagedKVPool:
    """Device-side page pool.

    k, v: [L, P, Hkv, PAGE_SIZE, Dh] (bf16, or int8 when quantized)
    k_scale, v_scale: [L, P, fold, Hkv, PAGE_SIZE//fold] f32 (zeros when not
    quantized) — phase-major so the attention kernel's flat [P, 1, Hkv*PAGE]
    scale view lines up with its score-column order (ops/paged_attention.py);
    token t of head h lives at [t % fold, h, t // fold].
    """

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array
    quantized: bool = False
    fold: int = 1

    @classmethod
    def create(
        cls,
        num_layers: int,
        num_pages: int,
        num_kv_heads: int,
        head_dim: int,
        dtype=jnp.bfloat16,
        quantized: bool = False,
    ) -> "PagedKVPool":
        fold = fold_for(head_dim)
        shape = (num_layers, num_pages, num_kv_heads, PAGE_SIZE, head_dim)
        sshape = (
            num_layers, num_pages, fold, num_kv_heads, PAGE_SIZE // fold,
        )
        store_dtype = jnp.int8 if quantized else dtype
        sdt = jnp.float32
        return cls(
            k=jnp.zeros(shape, store_dtype),
            v=jnp.zeros(shape, store_dtype),
            k_scale=jnp.zeros(sshape, sdt),
            v_scale=jnp.zeros(sshape, sdt),
            quantized=quantized,
            fold=fold,
        )

    @property
    def num_pages(self) -> int:
        return self.k.shape[1]


class PagedCacheManager:
    """Host-side page bookkeeping for a set of sequences.

    Wraps the native PageAllocator; tracks per-sequence page tables and
    copy-on-write prefix sharing via refcounts (reference
    page_allocator.cpp:89-92 add_ref semantics).
    """

    def __init__(self, num_pages: int, max_pages_per_seq: int):
        self.allocator = PageAllocator(num_pages)
        self.max_pages_per_seq = max_pages_per_seq
        self.tables: dict[int, list[int]] = {}

    def pages_needed(self, num_tokens: int) -> int:
        return -(-num_tokens // PAGE_SIZE)

    def can_allocate(self, num_tokens: int) -> bool:
        return self.allocator.num_free() >= self.pages_needed(num_tokens)

    def allocate_seq(self, seq_id: int, num_tokens: int) -> bool:
        """Reserve pages for a sequence's first num_tokens; False if the pool
        can't satisfy it (caller queues / preempts, reference scheduler
        exhaustion contract page_allocator.cpp:68-73)."""
        n = self.pages_needed(num_tokens)
        if n > self.max_pages_per_seq:
            raise ValueError(
                f"sequence needs {n} pages > max_pages_per_seq "
                f"{self.max_pages_per_seq}"
            )
        pages = self.allocator.allocate_n(n)
        if not pages and n > 0:
            return False
        self.tables[seq_id] = pages
        return True

    def extend_seq(self, seq_id: int, new_total_tokens: int) -> bool:
        """Grow a sequence's table to cover new_total_tokens."""
        table = self.tables[seq_id]
        need = self.pages_needed(new_total_tokens) - len(table)
        if need <= 0:
            return True
        if len(table) + need > self.max_pages_per_seq:
            return False
        pages = self.allocator.allocate_n(need)
        if not pages:
            return False
        table.extend(pages)
        return True

    def fork_seq(self, src_seq_id: int, dst_seq_id: int, shared_tokens: int):
        """Share the first pages of src with dst (prefix cache hit):
        refcounted copy-on-write at page granularity."""
        shared_pages = self.pages_needed(shared_tokens)
        src = self.tables[src_seq_id][:shared_pages]
        for p in src:
            self.allocator.add_ref(p)
        self.tables[dst_seq_id] = list(src)

    def free_seq(self, seq_id: int):
        for p in self.tables.pop(seq_id, []):
            self.allocator.free(p)

    def allocate_seq_with_prefix(
        self, seq_id: int, num_tokens: int, shared_pages: list[int]
    ) -> bool:
        """allocate_seq, but the first ``len(shared_pages)`` pages come
        from a prefix-cache hit: they are refcounted (add_ref) instead of
        freshly allocated, and the new sequence NEVER writes them (full
        shared pages only — a page boundary split means no copy-on-write
        is ever needed). On fresh-page exhaustion the refs are rolled
        back so the caller can evict and retry. Matches the reference's
        add_ref-for-shared-prefix intent (page_allocator.cpp:89-92)."""
        total = self.pages_needed(num_tokens)
        if total > self.max_pages_per_seq:
            raise ValueError(
                f"sequence needs {total} pages > max_pages_per_seq "
                f"{self.max_pages_per_seq}"
            )
        fresh_n = total - len(shared_pages)
        for p in shared_pages:
            self.allocator.add_ref(p)
        fresh = self.allocator.allocate_n(fresh_n) if fresh_n > 0 else []
        if fresh_n > 0 and not fresh:
            for p in shared_pages:
                self.allocator.free(p)
            return False
        self.tables[seq_id] = list(shared_pages) + fresh
        return True

    def block_table(self, seq_id: int) -> list[int]:
        return self.tables[seq_id]

    def num_free_pages(self) -> int:
        return self.allocator.num_free()


@dataclasses.dataclass
class _PrefixNode:
    key: tuple
    parent: Optional[tuple]
    page_id: int
    nchildren: int = 0
    last_use: int = 0


class PrefixStore:
    """Page-granularity prefix cache over the paged pool.

    A hash-chain trie of FULL pages: node key =
    (parent_key, tuple(page_token_ids)) — exact token tuples, so there are
    no hash-collision false hits. Each node holds one allocator reference
    on its page; matching a new prompt walks the trie and hands the caller
    refcounted pages to splice into the sequence's block table, so
    repeated system prompts prefill only their suffix (the reference
    treats prefix reuse as a core capability:
    proxy_inference_engine/cache/prompt_cache.py:31-76 single-stream,
    pie_core page_allocator.cpp:89-92 add_ref for the paged design; this
    is the paged-path realization the reference never wired up).

    KV content for a page depends only on the token prefix (RoPE is
    absolute-position over the same positions), so identical prefixes on
    the same model/params produce identical pages — for full-context AND
    sliding-window layers (window masks read positions, pages store all).

    Only whole pages are shared and at least the final prompt token is
    always left unshared (it is the wake/decode input whose KV the new
    lane writes itself), so a shared page is never written by a consumer:
    no copy-on-write path exists because none is needed.

    Eviction is LRU over LEAF nodes (an interior node's page backs every
    descendant chain, so leaves go first); ``evict`` frees until the
    allocator can satisfy the caller or the store is empty.
    """

    def __init__(self, manager: "PagedCacheManager"):
        self.manager = manager
        self.nodes: dict[tuple, _PrefixNode] = {}
        self._clock = 0
        self.hits = 0
        self.misses = 0
        self.hit_tokens = 0

    def __len__(self) -> int:
        return len(self.nodes)

    @staticmethod
    def _max_shared_pages(prompt_len: int) -> int:
        # reserve the final token: it must be prefilled/decoded by the
        # consumer lane itself
        return max(0, (prompt_len - 1) // PAGE_SIZE)

    def _chain(self, prompt_ids, limit_pages: int):
        key: Optional[tuple] = None
        for j in range(limit_pages):
            page = tuple(prompt_ids[j * PAGE_SIZE: (j + 1) * PAGE_SIZE])
            key = (key, page)
            yield j, key, page

    def match(self, prompt_ids: list[int]) -> list[int]:
        """Longest cached full-page prefix of ``prompt_ids``; returns the
        page ids (NOT yet refcounted — pass to
        allocate_seq_with_prefix, which takes the refs)."""
        self._clock += 1
        pages: list[int] = []
        for _, key, _page in self._chain(
            prompt_ids, self._max_shared_pages(len(prompt_ids))
        ):
            node = self.nodes.get(key)
            if node is None:
                break
            node.last_use = self._clock
            pages.append(node.page_id)
        if pages:
            self.hits += 1
            self.hit_tokens += len(pages) * PAGE_SIZE
        else:
            self.misses += 1
        return pages

    def insert(self, prompt_ids: list[int], table: list[int]):
        """Register a prefilled prompt's full pages. ``table`` is the
        sequence's block table; pages already in the trie keep the trie's
        page id (they are the very shared pages the sequence spliced in,
        or duplicates whose KV is identical); new nodes take one extra
        ref on the sequence's page so it survives the sequence."""
        self._clock += 1
        for j, key, _page in self._chain(
            prompt_ids, self._max_shared_pages(len(prompt_ids))
        ):
            node = self.nodes.get(key)
            if node is not None:
                node.last_use = self._clock
                continue
            parent = key[0]
            page_id = table[j]
            self.manager.allocator.add_ref(page_id)
            self.nodes[key] = _PrefixNode(
                key=key, parent=parent, page_id=page_id,
                last_use=self._clock,
            )
            if parent is not None:
                self.nodes[parent].nchildren += 1

    def evict(self, num_pages: int) -> int:
        """Free up to ``num_pages`` pages, oldest leaves first. Returns
        pages released (a released page only returns to the free list
        when no live sequence still references it)."""
        freed = 0
        while freed < num_pages and self.nodes:
            leaves = [
                n for n in self.nodes.values() if n.nchildren == 0
            ]
            if not leaves:  # cycle-impossible; defensive
                break
            victim = min(leaves, key=lambda n: n.last_use)
            del self.nodes[victim.key]
            if victim.parent is not None and victim.parent in self.nodes:
                self.nodes[victim.parent].nchildren -= 1
            self.manager.allocator.free(victim.page_id)
            freed += 1
        return freed

    def clear(self):
        self.evict(len(self.nodes))


# ---------------------------------------------------------------------------
# Device ops: write tokens into the pool, gather for attention
# ---------------------------------------------------------------------------


def write_tokens(
    pool: PagedKVPool,
    layer_k: jax.Array,  # [B, T, Hkv, Dh] new keys for ONE layer
    layer_v: jax.Array,
    layer_idx: int,
    block_tables: jax.Array,  # [B, maxP] int32 (-1 pad)
    positions: jax.Array,  # [B, T] token positions (define page slot)
) -> PagedKVPool:
    """Scatter new K/V into the pool (XLA path; the Pallas prefill kernel
    fuses this). positions -> (page = pos // PAGE_SIZE via block_tables,
    slot = pos % PAGE_SIZE)."""
    b, t = positions.shape
    num_pages = pool.k.shape[1]
    page_idx = positions // PAGE_SIZE  # logical page per token
    slot = positions % PAGE_SIZE
    phys = jnp.take_along_axis(
        block_tables, jnp.minimum(page_idx, block_tables.shape[1] - 1), axis=1
    )  # [B, T]
    # invalid slots (pad tokens / unmapped pages) are routed out-of-bounds so
    # mode="drop" discards them instead of corrupting physical page 0
    phys_safe = jnp.where(phys >= 0, phys, num_pages)

    def scat(arr, val):
        # advanced indices around the head slice put (B, T) in front, so the
        # value keeps its natural [B, T, Hkv, ...] shape
        return arr.at[layer_idx, phys_safe, :, slot].set(
            val.astype(arr.dtype), mode="drop"
        )

    if pool.quantized:
        from pie_tpu.cache.kv_cache import quantize_kv

        kq, ks = quantize_kv(layer_k)
        vq, vs = quantize_kv(layer_v)
        f = pool.fold
        return dataclasses.replace(
            pool,
            k=scat(pool.k, kq),
            v=scat(pool.v, vq),
            k_scale=pool.k_scale.at[
                layer_idx, phys_safe, slot % f, :, slot // f
            ].set(ks[..., 0], mode="drop"),
            v_scale=pool.v_scale.at[
                layer_idx, phys_safe, slot % f, :, slot // f
            ].set(vs[..., 0], mode="drop"),
        )
    return dataclasses.replace(
        pool, k=scat(pool.k, layer_k), v=scat(pool.v, layer_v)
    )


def gather_kv(
    pool: PagedKVPool,
    layer_idx: int,
    block_tables: jax.Array,  # [B, maxP]
    dtype=jnp.bfloat16,
) -> tuple[jax.Array, jax.Array]:
    """Gather a layer's K/V for a batch into dense [B, maxP*PAGE, Hkv, Dh]
    (XLA reference path for tests and the pre-kernel fallback)."""
    bt = jnp.maximum(block_tables, 0)
    k = pool.k[layer_idx][bt]  # [B, maxP, H, PAGE, D]
    v = pool.v[layer_idx][bt]
    if pool.quantized:
        ks = unpermute_page_scales(pool.k_scale[layer_idx][bt])
        vs = unpermute_page_scales(pool.v_scale[layer_idx][bt])
        k = k.astype(jnp.float32) * ks
        v = v.astype(jnp.float32) * vs
    k = jnp.swapaxes(k, 2, 3)  # [B, maxP, PAGE, H, D]
    v = jnp.swapaxes(v, 2, 3)
    b, mp, pg, h, d = k.shape
    return (
        k.reshape(b, mp * pg, h, d).astype(dtype),
        v.reshape(b, mp * pg, h, d).astype(dtype),
    )
