"""Paged attention for decode: Pallas TPU kernel + XLA reference.

This is the kernel the reference never built (its Metal paged_attention is a
placeholder copy kernel, reference src/kernels/paged_attention.metal:6-23;
the block-table layout here is co-designed with the kernel exactly as the
reference's BatchDetails warned it must be, include/engine/batch_details.hpp:
53-65).

Decode shape: one query token per sequence, KV scattered across 64-token
pages in a global HBM pool. The kernel walks each sequence's block table,
double-buffers page DMAs HBM->VMEM, and maintains a flash-attention online
softmax. INT8 pages carry per-(token, head) scales (reference page.hpp:
104-117 layout) applied to the score / probability matrices, never
materializing a dequantized cache.

TPU lane-alignment design (Mosaic requires DMA'd blocks and their source
views to have 128-aligned minor dims):

- K/V pool pages are [Hkv, PAGE, D] per physical page. For D < 128 the
  wrapper bitcast-reshapes the pool to [P, Hkv*(PAGE/f), f*D] with
  f = 128//D ("fold"): row (h, t2) packs tokens t2*f..t2*f+f-1 of head h in
  its f lane-blocks, which is exactly the natural row-major order — the
  reshape is free. At D=64 (Llama-3.2-1B, the round-1 Mosaic failure) this
  gives 128-lane rows; at D=128 it is the identity.
- Scores for lane-block phase j come from a zero-padded query copy
  q_j = [0..0 | q | 0..0] (q at lanes j*D..): one [Hq, f*D] x [f*D, Hkv*rows]
  MXU dot per phase covers ALL kv heads at once; a block-diagonal head mask
  (h_col == h_row // rep) built from iota removes cross-head terms before
  softmax, and zero off-block probabilities make the [Hq, S] x [S?]  PV dot
  exact.
- Scales are stored phase-major ([P, f, Hkv, PAGE/f], see
  cache/paged.py) so their flat [P, 1, Hkv*PAGE] view lines up with the
  score columns — applied as one [1, S] row broadcast, no per-head slicing.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pie_tpu.cache.paged import PAGE_SIZE, fold_for, unpermute_page_scales

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
# page-walk DMA pipeline depth (in-flight iteration buffers); 4 hides the
# per-page issue latency that capped the kernel at ~262 GB/s at 2k ctx
PAGE_NBUF = int(__import__("os").environ.get("PIE_PAGED_NBUF", "4"))
# pages processed per walk iteration: amortizes the fori_loop scalar work,
# semaphore waits and online-softmax passes over PPI pages and deepens the
# score/PV dots. Same-process A/B at 8 lanes / 2k ctx (ab_paged.py):
# ppi=2 +0.50%, ppi=4 +0.54% vs ppi=1 — NBUF=4 rotating buffers already
# hide the per-page issue latency, and the deeper dots buy nothing the
# stream doesn't. Default stays 1; the generalized walk is kept (parity-
# tested at ppi 2/3/4) for geometries with smaller pages.
PAGE_PPI = int(__import__("os").environ.get("PIE_PAGED_PPI", "1"))


def decode_kernel_supported(d: int, hkv: int, quantized: bool) -> bool:
    """True when the Pallas decode kernel's Mosaic DMA layout constraints
    hold for this geometry; callers must route to ``paged_attention_xla``
    otherwise. Two constraints:

    - the folded K/V page rows must be 128-lane aligned: fold_for(d)*d % 128
      (fails for head_dim like 80 or 96 that neither divides nor is a
      multiple of 128);
    - the flat per-page scale view DMA'd for int8 pools is [1, Hkv*PAGE];
      its minor dim must also be a 128 multiple (fails for MQA Hkv=1 where
      Hkv*64 == 64)."""
    if (fold_for(d) * d) % 128 != 0:
        return False
    if quantized and (hkv * PAGE_SIZE) % 128 != 0:
        return False
    return True


# ---------------------------------------------------------------------------
# XLA reference implementation (tests / CPU fallback)
# ---------------------------------------------------------------------------


def paged_attention_xla(
    q: jax.Array,  # [B, Hq, D]
    pool_k_layer: jax.Array,  # [P, Hkv, PAGE, D]
    pool_v_layer: jax.Array,
    block_tables: jax.Array,  # [B, maxP] int32 (-1 pad)
    context_lens: jax.Array,  # [B]
    scale: float,
    k_scale: Optional[jax.Array] = None,  # [P, f, Hkv, PAGE//f] (pool layout)
    v_scale: Optional[jax.Array] = None,
    window: Optional[int] = None,  # sliding-window width (gemma-3 layers)
) -> jax.Array:
    b, hq, d = q.shape
    bt = jnp.maximum(block_tables, 0)
    k = pool_k_layer[bt]  # [B, maxP, Hkv, PAGE, D]
    v = pool_v_layer[bt]
    if k_scale is not None:
        ks = unpermute_page_scales(k_scale[bt])  # [B, maxP, Hkv, PAGE, 1]
        vs = unpermute_page_scales(v_scale[bt])
        k = k.astype(jnp.float32) * ks
        v = v.astype(jnp.float32) * vs
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
    if window is not None:
        # decode query sits at position ctx-1: attend kv pos > q - window.
        # window may be a traced scalar (gemma-3 per-layer select inside a
        # scan); <= 0 means full attention, matching the Pallas kernel.
        w = jnp.asarray(window)
        lo = jnp.where(w > 0, context_lens[:, None] - w, 0)
        valid &= jnp.arange(s)[None, :] >= lo
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
    window_ref,  # [1] SMEM — sliding-window width (<=0 = full attention;
    #              TRACED so gemma-3's per-layer sliding/global select works
    #              inside one lax.scan, reference models/gemma/language.py:
    #              219-236 dual masks)
    # inputs
    q_ref,  # [1, Hq, D] VMEM block for this b
    k_pool_ref,  # [P, Hkv*rows, f*D] in ANY/HBM (folded view); with
    #              stacked=True: [L, P, Hkv*rows, f*D] + a layer_ref
    v_pool_ref,
    ks_pool_ref,  # [P, 1, S] f32 flat phase-major scales (or [1,1,1] dummy)
    vs_pool_ref,
    # outputs
    out_ref,  # [1, Hq, D]
    # scratch
    k_buf,  # [NBUF, Hkv*rows, f*D] — NBUF-deep rotating page buffers
    v_buf,
    ks_buf,  # [NBUF, 1, S] f32
    vs_buf,
    sems,  # DMA sems [NBUF, 4]
    *,
    scale: float,
    num_kv_heads: int,
    rep: int,
    fold: int,
    quantized: bool,
    layer_ref=None,  # [1] SMEM scalar-prefetch (stacked pools only)
):
    b = pl.program_id(0)
    ctx_len = context_lens_ref[b]
    num_pages = pl.cdiv(ctx_len, PAGE_SIZE)
    win = window_ref[0]
    # first kv position a windowed query may attend (window covers the
    # query itself at ctx-1: positions >= ctx - win); page walk starts at
    # its iteration so out-of-window pages are (mostly) never DMA'd
    lo = jnp.where(win > 0, jnp.maximum(ctx_len - win, 0), 0)
    start_page = lo // PAGE_SIZE
    d = q_ref.shape[-1]
    hq = num_kv_heads * rep
    rows = PAGE_SIZE // fold
    hr = num_kv_heads * rows  # columns per phase
    s = fold * hr  # total score columns per page (= Hkv*PAGE)
    ppi = k_buf.shape[1]  # pages per walk iteration
    it0 = start_page // ppi
    n_iters = pl.cdiv(num_pages, ppi)

    def pool_at(ref, phys):
        # stacked pools arrive as a FLAT [L*P, ...] view and are indexed
        # layer*P + page INSIDE the DMA — the caller never slices the layer
        # out, so no [P, ...] copy of the pool is ever materialized per
        # layer (that slice-copy cost ~1.3 ms/step at 8B: 4 arrays x
        # 7.4 MB x 32 layers). Single-level dynamic indexing only: Mosaic
        # DMA with a two-level ref.at[l, p] index miscompiles.
        if layer_ref is not None:
            p = ref.shape[0] // layer_ref[1]
            return ref.at[layer_ref[0] * p + phys]
        return ref.at[phys]

    def iter_dma(slot, it):
        # DMA the iteration's PPI pages; tail sub-pages past the last page
        # clamp to the last valid page (their scores are masked out), so
        # every iteration issues a uniform set of copies
        copies = []
        for j in range(ppi):
            lp = jnp.minimum(it * ppi + j, num_pages - 1)
            phys = jnp.maximum(block_tables_ref[b, lp], 0)
            copies += [
                pltpu.make_async_copy(
                    pool_at(k_pool_ref, phys), k_buf.at[slot, j],
                    sems.at[slot, j, 0]
                ),
                pltpu.make_async_copy(
                    pool_at(v_pool_ref, phys), v_buf.at[slot, j],
                    sems.at[slot, j, 1]
                ),
            ]
            if quantized:
                copies += [
                    pltpu.make_async_copy(
                        pool_at(ks_pool_ref, phys), ks_buf.at[slot, j],
                        sems.at[slot, j, 2]
                    ),
                    pltpu.make_async_copy(
                        pool_at(vs_pool_ref, phys), vs_buf.at[slot, j],
                        sems.at[slot, j, 3]
                    ),
                ]
        return copies

    # keep NBUF-1 iteration DMAs in flight: at ~0.36 us of issue/wait
    # latency per page (measured: 124 us for 240 x 128 KB pages = 262 GB/s
    # at 2k ctx), 2-deep buffering serialized latency with compute; deeper
    # buffering hides it behind the stream
    nbuf = k_buf.shape[0]
    for ahead in range(nbuf - 1):
        @pl.when(it0 + ahead < n_iters)
        def _(ahead=ahead):
            for c in iter_dma((it0 + ahead) % nbuf, it0 + ahead):
                c.start()

    q = q_ref[0].astype(jnp.float32) * scale  # [Hq, D]
    # one zero-padded query copy per lane-block phase: q at lanes j*D..
    zeros = jnp.zeros((hq, d), jnp.float32)
    q_phases = [
        jnp.concatenate([zeros] * j + [q] + [zeros] * (fold - 1 - j), axis=1)
        if fold > 1 else q
        for j in range(fold)
    ]  # each [Hq, f*D]

    # loop-invariant mask pieces over the PAGE-MAJOR [Hq, PPI*S] score
    # tile: column -> (page pg, phase j, kv head h, packed row t2); token
    # pos relative to the iteration base = pg*PAGE + t2*fold + j; row ->
    # its kv head hq_row // rep.
    col = jax.lax.broadcasted_iota(jnp.int32, (hq, ppi * s), 1)
    pg = col // s
    cc = col - pg * s
    jph = cc // hr
    rem = cc - jph * hr
    h_col = rem // rows
    rel_pos = pg * PAGE_SIZE + (rem - h_col * rows) * fold + jph
    h_row = jax.lax.broadcasted_iota(jnp.int32, (hq, ppi * s), 0) // rep
    head_ok = h_col == h_row

    def body(it, carry):
        m, l, acc = carry  # [Hq,1], [Hq,1], [Hq,D]
        slot = it % nbuf

        @pl.when(it + nbuf - 1 < n_iters)
        def _():
            for c in iter_dma((it + nbuf - 1) % nbuf, it + nbuf - 1):
                c.start()

        for c in iter_dma(slot, it):
            c.wait()

        if fold == 1:
            # one deep dot over all PPI pages: the flat [PPI*hr, D] view
            # of the slot's buffer has rows in (page, head, token) order —
            # exactly the page-major score-column order
            kp = k_buf[slot].reshape(ppi * hr, fold * d).astype(jnp.float32)
            scores = jax.lax.dot_general(
                q, kp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Hq, PPI*S]
        else:
            parts = []
            for j in range(ppi):
                kp = k_buf[slot, j].astype(jnp.float32)  # [hr, f*D]
                parts += [
                    jax.lax.dot_general(
                        qj, kp, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for qj in q_phases
                ]
            scores = jnp.concatenate(parts, axis=1)  # [Hq, PPI*S]
        if quantized:
            # [PPI, 1, S] -> [1, PPI*S]: page-major flat, matches columns
            scores = scores * ks_buf[slot].reshape(1, ppi * s)
        base0 = it * ppi * PAGE_SIZE
        valid = (
            head_ok
            & (rel_pos < ctx_len - base0)
            & (rel_pos >= lo - base0)
        )
        scores = jnp.where(valid, scores, NEG_INF)

        page_m = jnp.max(scores, axis=-1, keepdims=True)  # [Hq, 1]
        new_m = jnp.maximum(m, page_m)
        alpha = jnp.exp(m - new_m)
        probs = jnp.exp(scores - new_m)  # [Hq, PPI*S]
        new_l = l * alpha + jnp.sum(probs, axis=-1, keepdims=True)
        if quantized:
            probs = probs * vs_buf[slot].reshape(1, ppi * s)
        if fold == 1:
            vp = v_buf[slot].reshape(ppi * hr, fold * d).astype(jnp.float32)
            contrib = jnp.dot(probs, vp, preferred_element_type=jnp.float32)
        else:
            contrib = jnp.zeros((hq, d), jnp.float32)
            for pj_idx in range(ppi):
                vp = v_buf[slot, pj_idx].astype(jnp.float32)  # [hr, f*D]
                for j in range(fold):
                    pj = probs[:, pj_idx * s + j * hr:
                               pj_idx * s + (j + 1) * hr]  # [Hq, hr]
                    oj = jnp.dot(pj, vp, preferred_element_type=jnp.float32)
                    contrib = contrib + oj[:, j * d:(j + 1) * d]
        new_acc = acc * alpha + contrib
        return new_m, new_l, new_acc

    init = (
        jnp.full((hq, 1), NEG_INF, jnp.float32),
        jnp.zeros((hq, 1), jnp.float32),
        jnp.zeros((hq, d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(it0, n_iters, body, init)
    out = acc / jnp.maximum(l, 1e-30)
    out_ref[0] = out.astype(out_ref.dtype)


def _decode_kernel_stacked(bt_ref, ctx_ref, win_ref, layer_ref, q_ref,
                           k_ref, v_ref, ks_ref, vs_ref, out_ref, *scratch,
                           **params):
    _decode_kernel(bt_ref, ctx_ref, win_ref, q_ref, k_ref, v_ref, ks_ref,
                   vs_ref, out_ref, *scratch, layer_ref=layer_ref, **params)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret")
)
def paged_attention_decode_stacked(
    q: jax.Array,  # [B, Hq, D]
    pool_k: jax.Array,  # [L, P, Hkv, PAGE, D] FULL stacked pool
    pool_v: jax.Array,
    ks: jax.Array,  # [L, P, f, Hkv, PAGE//f] (ignored unless int8 pool)
    vs: jax.Array,
    layer: jax.Array,  # scalar int32
    block_tables: jax.Array,  # [B, maxP]
    context_lens: jax.Array,  # [B]
    scale: float,
    window=None,  # traced scalar int32 (<=0/None = full attention)
    interpret: bool = False,
) -> jax.Array:
    """Decode paged attention over the FULL layer-stacked pool: the layer
    id is scalar-prefetched and applied inside each page DMA, so a
    ``lax.scan`` over layers never materializes a per-layer pool slice
    (``_dyn(pool, i)`` before the unstacked kernel copies ~30 MB/layer)."""
    b, hq, d = q.shape
    nl, p, hkv, page, _ = pool_k.shape
    assert page == PAGE_SIZE
    rep = hq // hkv
    quantized = pool_k.dtype == jnp.int8
    fold = fold_for(d)
    assert (fold * d) % 128 == 0, (
        f"head_dim {d} cannot fold to a 128-lane row; use the XLA path"
    )
    rows = page // fold
    hr = hkv * rows
    s = hkv * page

    # flat [L*P, ...] views: the kernel DMAs row layer*P + page (free
    # bitcast reshapes — L, P are the leading dims)
    kf = pool_k.reshape(nl * p, hr, fold * d)
    vf = pool_v.reshape(nl * p, hr, fold * d)
    if quantized:
        ksf = ks.reshape(nl * p, 1, s)
        vsf = vs.reshape(nl * p, 1, s)
    else:
        ksf = jnp.zeros((1, 1, 128), jnp.float32)
        vsf = jnp.zeros((1, 1, 128), jnp.float32)

    win_arr = jnp.asarray(
        0 if window is None else window, jnp.int32
    ).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
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
            pltpu.VMEM((PAGE_NBUF, PAGE_PPI, hr, fold * d), pool_k.dtype),
            pltpu.VMEM((PAGE_NBUF, PAGE_PPI, hr, fold * d), pool_k.dtype),
            pltpu.VMEM(
                (PAGE_NBUF, PAGE_PPI, 1, s if quantized else 128),
                jnp.float32,
            ),
            pltpu.VMEM(
                (PAGE_NBUF, PAGE_PPI, 1, s if quantized else 128),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((PAGE_NBUF, PAGE_PPI, 4)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel_stacked,
        scale=scale,
        num_kv_heads=hkv,
        rep=rep,
        fold=fold,
        quantized=quantized,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        interpret=interpret,
    )(block_tables, context_lens, win_arr,
      jnp.stack([jnp.asarray(layer, jnp.int32),
                 jnp.asarray(nl, jnp.int32)]), q, kf, vf, ksf, vsf)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret")
)
def paged_attention_decode(
    q: jax.Array,  # [B, Hq, D]
    pool_k_layer: jax.Array,  # [P, Hkv, PAGE, D]
    pool_v_layer: jax.Array,
    ks_layer: jax.Array,  # [P, f, Hkv, PAGE//f] (ignored unless int8 pool)
    vs_layer: jax.Array,
    block_tables: jax.Array,  # [B, maxP]
    context_lens: jax.Array,  # [B]
    scale: float,
    window=None,  # traced scalar int32 (<=0/None = full attention)
    interpret: bool = False,
) -> jax.Array:
    b, hq, d = q.shape
    p, hkv, page, _ = pool_k_layer.shape
    assert page == PAGE_SIZE
    rep = hq // hkv
    quantized = pool_k_layer.dtype == jnp.int8
    fold = fold_for(d)
    assert (fold * d) % 128 == 0, (
        f"head_dim {d} cannot fold to a 128-lane row; use the XLA path"
    )
    rows = page // fold
    hr = hkv * rows
    s = hkv * page

    # free bitcast views: [P, Hkv, PAGE, D] -> [P, Hkv*rows, f*D];
    # scales [P, f, Hkv, rows] -> [P, 1, S] matching score-column order
    kf = pool_k_layer.reshape(p, hr, fold * d)
    vf = pool_v_layer.reshape(p, hr, fold * d)
    if quantized:
        ksf = ks_layer.reshape(p, 1, s)
        vsf = vs_layer.reshape(p, 1, s)
    else:
        ksf = jnp.zeros((1, 1, 128), jnp.float32)
        vsf = jnp.zeros((1, 1, 128), jnp.float32)

    win_arr = jnp.asarray(
        0 if window is None else window, jnp.int32
    ).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
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
            pltpu.VMEM((PAGE_NBUF, PAGE_PPI, hr, fold * d), pool_k_layer.dtype),
            pltpu.VMEM((PAGE_NBUF, PAGE_PPI, hr, fold * d), pool_k_layer.dtype),
            pltpu.VMEM(
                (PAGE_NBUF, PAGE_PPI, 1, s if quantized else 128),
                jnp.float32,
            ),
            pltpu.VMEM(
                (PAGE_NBUF, PAGE_PPI, 1, s if quantized else 128),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((PAGE_NBUF, PAGE_PPI, 4)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        num_kv_heads=hkv,
        rep=rep,
        fold=fold,
        quantized=quantized,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        interpret=interpret,
    )(block_tables, context_lens, win_arr, q, kf, vf, ksf, vsf)
