"""Attention ops: GQA scaled-dot-product attention and mask construction.

Reference parity: models/base.py:18-113 (causal + sliding-window masks,
dtype-aware SDPA dispatch). TPU-first: fixed-shape batched attention over a
static-capacity KV buffer with position-based validity masks instead of the
reference's per-request growable caches; f32 softmax; XLA fuses the decode
(T=1) path into a few kernels. The paged-pool variant lives in
pie_tpu/ops/paged_attention.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def attention_mask(
    q_positions: jax.Array,
    kv_positions: jax.Array,
    window_size: Optional[int] = None,
) -> jax.Array:
    """Boolean mask [B, Tq, Skv]: True = attend.

    q_positions: [B, Tq] global position of each query token.
    kv_positions: [B, Skv] global position held by each kv slot; -1 = empty
                  (slot-position masks subsume the reference's causal +
                  sliding-window mask construction, models/base.py:18-53).
    window_size: sliding-window width.
    """
    q = q_positions[:, :, None]
    kv = kv_positions[:, None, :]
    mask = (kv >= 0) & (kv <= q)  # valid slot + causal
    if window_size is not None:
        mask &= kv > (q - window_size)
    return mask


def sdpa_quantized(
    q: jax.Array,
    kq: jax.Array,  # [B, Skv, Hkv, D] int8
    ks: jax.Array,  # [B, Skv, Hkv, 1] f32 per-(token, head) scales
    vq: jax.Array,
    vs: jax.Array,
    mask: Optional[jax.Array],
    scale: float,
) -> jax.Array:
    """GQA attention directly over int8-quantized KV (reference
    models/base.py:56-89 quantized SDPA).

    Never materializes a dequantized copy of the cache: the per-(token,
    head) K scale factors out of the dot (scores = ks * (q . kq)) and the
    V scale folds into the probabilities (out = (probs * vs) . vq), so the
    only cache traffic is the int8 stream itself — int8 KV decode reads
    ~2x less HBM than bf16 KV instead of 1.5x more (round-1 weakness:
    dequantize_kv per layer step wrote a full bf16 cache copy).
    """
    b, tq, hq, d = q.shape
    hkv = kq.shape[2]
    rep = hq // hkv
    qg = q.reshape(b, tq, hkv, rep, d).astype(jnp.bfloat16)
    scores = jnp.einsum(
        "bthrd,bshd->bhrts", qg, kq.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    scores = scores * (scale * ks[..., 0].transpose(0, 2, 1))[:, :, None, None, :]
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)  # [B, Hkv, rep, Tq, S]
    pv = probs * vs[..., 0].transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum(
        "bhrts,bshd->bthrd", pv.astype(jnp.bfloat16),
        vq.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
    )
    return out.reshape(b, tq, hq, d).astype(q.dtype)


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    scale: float,
    logit_softcap: Optional[float] = None,
) -> jax.Array:
    """GQA scaled dot-product attention.

    q: [B, Tq, Hq, D]; k, v: [B, Skv, Hkv, D]; mask: [B, Tq, Skv] bool.
    Returns [B, Tq, Hq, D] in q.dtype. Softmax in f32.
    """
    b, tq, hq, d = q.shape
    hkv = k.shape[2]
    rep = hq // hkv
    qg = q.reshape(b, tq, hkv, rep, d)
    scores = jnp.einsum(
        "bthrd,bshd->bhrts", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if logit_softcap is not None:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhrts,bshd->bthrd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, tq, hq, d).astype(q.dtype)
