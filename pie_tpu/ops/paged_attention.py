"""Paged attention for decode: Pallas TPU kernel + XLA reference.

This is the kernel the reference never built (its Metal paged_attention is a
placeholder copy kernel, reference src/kernels/paged_attention.metal:6-23;
the block-table layout here is co-designed with the kernel exactly as the
reference's BatchDetails warned it must be, include/engine/batch_details.hpp:
53-65).

Decode shape: one query token per sequence, KV scattered across 64-token
pages in a global HBM pool. The kernel walks each sequence's block table,
double-buffers page DMAs HBM->VMEM, and maintains a flash-attention online
softmax; GQA computes all q heads of a kv head against the page in one dot.
INT8 pages are dequantized in VMEM with per-(token, head) scales (reference
page.hpp:104-117 layout).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pie_tpu.cache.paged import PAGE_SIZE, PagedKVPool

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


# ---------------------------------------------------------------------------
# XLA reference implementation (tests / CPU fallback)
# ---------------------------------------------------------------------------


def paged_attention_xla(
    q: jax.Array,  # [B, Hq, D]
    pool_k_layer: jax.Array,  # [P, Hkv, PAGE, D] (+ optional scales)
    pool_v_layer: jax.Array,
    block_tables: jax.Array,  # [B, maxP] int32 (-1 pad)
    context_lens: jax.Array,  # [B]
    scale: float,
    k_scale: Optional[jax.Array] = None,  # [P, Hkv, PAGE, 1]
    v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    b, hq, d = q.shape
    bt = jnp.maximum(block_tables, 0)
    k = pool_k_layer[bt]  # [B, maxP, Hkv, PAGE, D]
    v = pool_v_layer[bt]
    if k_scale is not None:
        k = k.astype(jnp.float32) * k_scale[bt]
        v = v.astype(jnp.float32) * v_scale[bt]
    mp = bt.shape[1]
    hkv = k.shape[2]
    k = jnp.swapaxes(k, 2, 3)  # [B, maxP, PAGE, Hkv, D]
    v = jnp.swapaxes(v, 2, 3)
    s = mp * PAGE_SIZE
    k = k.reshape(b, s, hkv, d)
    v = v.reshape(b, s, hkv, d)
    rep = hq // hkv
    qg = q.reshape(b, hkv, rep, d).astype(jnp.float32)
    scores = jnp.einsum(
        "bhrd,bshd->bhrs", qg, k.astype(jnp.float32)
    ) * scale
    valid = jnp.arange(s)[None, :] < context_lens[:, None]
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhrs,bshd->bhrd", probs, v.astype(jnp.float32))
    return out.reshape(b, hq, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas decode kernel
# ---------------------------------------------------------------------------


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # [B, maxP] SMEM
    context_lens_ref,  # [B] SMEM
    # inputs
    q_ref,  # [1, Hq, D] VMEM block for this b
    k_pool_ref,  # [P, Hkv, PAGE, D] in ANY/HBM
    v_pool_ref,
    ks_pool_ref,  # [P, Hkv, PAGE, 1] or [1,1,1,1] dummy
    vs_pool_ref,
    # outputs
    out_ref,  # [1, Hq, D]
    # scratch
    k_buf,  # [2, Hkv, PAGE, D]
    v_buf,
    ks_buf,  # [2, Hkv, PAGE, 1]
    vs_buf,
    sems,  # DMA sems [2, 4]
    *,
    scale: float,
    num_kv_heads: int,
    rep: int,
    max_pages: int,
    quantized: bool,
):
    b = pl.program_id(0)
    ctx_len = context_lens_ref[b]
    num_pages = pl.cdiv(ctx_len, PAGE_SIZE)
    d = q_ref.shape[-1]

    def page_dma(slot, logical_page):
        phys = block_tables_ref[b, logical_page]
        copies = [
            pltpu.make_async_copy(
                k_pool_ref.at[phys], k_buf.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                v_pool_ref.at[phys], v_buf.at[slot], sems.at[slot, 1]
            ),
        ]
        if quantized:
            copies += [
                pltpu.make_async_copy(
                    ks_pool_ref.at[phys], ks_buf.at[slot], sems.at[slot, 2]
                ),
                pltpu.make_async_copy(
                    vs_pool_ref.at[phys], vs_buf.at[slot], sems.at[slot, 3]
                ),
            ]
        return copies

    @pl.when(num_pages > 0)
    def _():
        for c in page_dma(0, 0):
            c.start()

    q = q_ref[0].astype(jnp.float32) * scale  # [Hq, D]

    def body(p, carry):
        m, l, acc = carry  # [Hq,1], [Hq,1], [Hq,D]
        slot = p % 2

        @pl.when(p + 1 < num_pages)
        def _():
            for c in page_dma((p + 1) % 2, p + 1):
                c.start()

        for c in page_dma(slot, p):
            c.wait()

        # token validity within this page
        tok_pos = p * PAGE_SIZE + jax.lax.broadcasted_iota(
            jnp.int32, (1, PAGE_SIZE), 1
        )
        valid = tok_pos < ctx_len  # [1, PAGE]

        # per-kv-head tiles are leading-dim slices of the head-major page
        # buffer: [PAGE, D] with clean sublane/lane tiling at any head_dim
        scores_heads = []
        for h in range(num_kv_heads):
            qh = q[h * rep:(h + 1) * rep, :]  # [rep, D] (static slice)
            kh = k_buf[slot, h].astype(jnp.float32)  # [PAGE, D]
            if quantized:
                kh = kh * ks_buf[slot, h]
            s_h = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [rep, PAGE]
            scores_heads.append(jnp.where(valid, s_h, NEG_INF))
        scores = jnp.concatenate(scores_heads, axis=0)  # [Hq, PAGE]

        page_m = jnp.max(scores, axis=-1, keepdims=True)  # [Hq, 1]
        new_m = jnp.maximum(m, page_m)
        alpha = jnp.exp(m - new_m)
        probs = jnp.exp(scores - new_m)  # [Hq, PAGE]
        new_l = l * alpha + jnp.sum(probs, axis=-1, keepdims=True)
        pv_heads = []
        for h in range(num_kv_heads):
            ph = probs[h * rep:(h + 1) * rep, :]  # static slice
            vh = v_buf[slot, h].astype(jnp.float32)  # [PAGE, D]
            if quantized:
                vh = vh * vs_buf[slot, h]
            pv_heads.append(
                jnp.dot(ph, vh, preferred_element_type=jnp.float32)
            )  # [rep, D]
        pv = jnp.concatenate(pv_heads, axis=0)  # [Hq, D]
        new_acc = acc * alpha + pv
        return new_m, new_l, new_acc

    hq = num_kv_heads * rep
    init = (
        jnp.full((hq, 1), NEG_INF, jnp.float32),
        jnp.zeros((hq, 1), jnp.float32),
        jnp.zeros((hq, d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, num_pages, body, init)
    out = acc / jnp.maximum(l, 1e-30)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret")
)
def paged_attention_decode(
    q: jax.Array,  # [B, Hq, D]
    pool_k_layer: jax.Array,  # [P, Hkv, PAGE, D]
    pool_v_layer: jax.Array,
    ks_layer: jax.Array,  # [P, Hkv, PAGE, 1] (ignored unless int8 pool)
    vs_layer: jax.Array,
    block_tables: jax.Array,  # [B, maxP]
    context_lens: jax.Array,  # [B]
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    b, hq, d = q.shape
    p, hkv, page, _ = pool_k_layer.shape
    assert page == PAGE_SIZE
    rep = hq // hkv
    max_pages = block_tables.shape[1]
    quantized = pool_k_layer.dtype == jnp.int8

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, hkv, PAGE_SIZE, d), pool_k_layer.dtype),
            pltpu.VMEM((2, hkv, PAGE_SIZE, d), pool_k_layer.dtype),
            pltpu.VMEM((2, hkv, PAGE_SIZE, 1), jnp.float32),
            pltpu.VMEM((2, hkv, PAGE_SIZE, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        num_kv_heads=hkv,
        rep=rep,
        max_pages=max_pages,
        quantized=quantized,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        interpret=interpret,
    )(block_tables, context_lens, q, pool_k_layer, pool_v_layer,
      ks_layer, vs_layer)
