"""Group-wise affine weight-only quantization (INT4 / INT8).

Semantics mirror the reference engine's MLX quantization contract
(reference: cache/kv_cache/quantized.py:59-105 layout — packed uint32 words
holding ``el_per_int = 32 // bits`` elements, per-group ``scales`` and
``biases``; models/utils.py:95-111 group-wise weight quantization with group
sizes 32/64/128), but the storage layout is TPU-native:

- Weights are stored **[K, N]** ("KN layout", contraction dim leading) so the
  matmul is ``y = x @ W`` with quantization groups running along K.
- Packing is **tile-strided**: K is divided into tiles of ``PACK_TILE_K=512``
  rows; within a tile of ``ep = 32//bits`` sub-blocks, the uint32 word at
  packed row ``kp`` holds original rows ``{tile_base + i*Kpt + kp}`` at bit
  field ``i`` (LSB first). The Pallas kernel then unpacks a packed block into
  ``ep`` contiguous row blocks and a single concatenate along sublanes
  restores original row order — no cross-lane interleave needed on the VPU.

Dequantization: ``w = q * scale + bias`` with ``q`` unsigned in
``[0, 2**bits - 1]``, ``scale = (max-min)/(2**bits-1)``, ``bias = min`` per
group — matching the affine scheme of the reference (cache/kv_cache/
quantized.py:91-105).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# K rows covered by one packing tile. All llama-family contraction dims
# (hidden, intermediate, num_heads*head_dim) are multiples of 512; K is
# zero-padded up to a multiple otherwise (harmless: y = sum_k x_k w_k and the
# padded x rows are zero).
PACK_TILE_K = 512

SUPPORTED_BITS = (4, 8)
SUPPORTED_GROUPS = (32, 64, 128)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("packed", "scales", "biases"),
    meta_fields=("bits", "group_size", "shape"),
)
@dataclasses.dataclass(frozen=True)
class QuantizedTensor:
    """A group-wise affine quantized matrix in KN layout.

    packed:  uint32 [K // (32//bits), N] — tile-strided packed codes.
    scales:  [K // group_size, N] — per-(group, out-feature) scale.
    biases:  [K // group_size, N] — per-(group, out-feature) bias (zero point
             in value space: w = q * scale + bias).
    shape:   logical (K, N) BEFORE K padding (static metadata).
    """

    packed: jax.Array
    scales: jax.Array
    biases: jax.Array
    bits: int
    group_size: int
    shape: tuple[int, int]

    @property
    def el_per_int(self) -> int:
        return 32 // self.bits

    @property
    def padded_k(self) -> int:
        return self.packed.shape[-2] * self.el_per_int

    @property
    def mem_bytes(self) -> int:
        return (
            self.packed.size * 4 + self.scales.size * self.scales.dtype.itemsize * 2
        )


def _pad_k(w: jax.Array, multiple: int) -> jax.Array:
    k = w.shape[-2]
    pad = (-k) % multiple
    if pad == 0:
        return w
    pad_width = [(0, 0)] * w.ndim
    pad_width[-2] = (0, pad)
    return jnp.pad(w, pad_width)


def compute_qparams(
    w: jax.Array, group_size: int, bits: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Quantize ``w`` [K, N] along K in groups; returns (q, scales, biases).

    q is int32 codes in [0, 2**bits - 1], scales/biases are [K//g, N] in
    ``w.dtype``.
    """
    k, n = w.shape[-2], w.shape[-1]
    assert k % group_size == 0, (k, group_size)
    g = group_size
    wf = w.astype(jnp.float32)
    grp = wf.reshape(*w.shape[:-2], k // g, g, n)
    wmax = grp.max(axis=-2)
    wmin = grp.min(axis=-2)
    n_bins = (1 << bits) - 1
    delta = (wmax - wmin) / n_bins
    # Degenerate (constant) groups: scale 1, all codes 0, bias reproduces value.
    scale = jnp.where(delta > 1e-8, delta, 1.0)
    q = jnp.clip(
        jnp.round((grp - wmin[..., None, :]) / scale[..., None, :]), 0, n_bins
    ).astype(jnp.int32)
    q = q.reshape(*w.shape[:-2], k, n)
    return q, scale.astype(w.dtype), wmin.astype(w.dtype)


def _pack4_planes(q4: jax.Array) -> jax.Array:
    """Pack int4 codes [.., T, 512, N] -> uint32 [.., T, 64, N] in the
    plane-paired layout the Pallas kernel unpacks with one
    ``(w >> 4j) & 0x000F000F | 0x3F803F80`` + bitcast per 128-row plane:

    - plane j (j=0..3) covers code rows [128j, 128j+128) of the tile;
    - within plane j, word row r holds code row ``128j + 2r`` at bits
      [4j, 4j+4) and code row ``128j + 2r + 1`` at bits [16+4j, 16+4j+4)
      (u32 -> bf16 bitcast on TPU interleaves rows: out row 2r is the low
      half of word row r, row 2r+1 the high half — verified on hardware).
    """
    lead = q4.shape[:-3]
    t, n = q4.shape[-3], q4.shape[-1]
    qt = q4.reshape(*lead, t, 4, 64, 2, n).astype(jnp.uint32)
    word = jnp.zeros((*lead, t, 64, n), jnp.uint32)
    for j in range(4):
        for h in range(2):
            word = word | (
                qt[..., j, :, h, :] << jnp.uint32(4 * j + 16 * h)
            )
    return word


def _unpack4_planes(word: jax.Array) -> jax.Array:
    """Inverse of :func:`_pack4_planes`: [.., T, 64, N] -> [.., T, 512, N]."""
    lead = word.shape[:-3]
    t, n = word.shape[-3], word.shape[-1]
    mask = jnp.uint32(0xF)
    parts = []
    for j in range(4):
        for h in range(2):
            parts.append(
                ((word >> jnp.uint32(4 * j + 16 * h)) & mask).astype(jnp.int32)
            )
    # parts index p = 2j + h -> code rows 128j + 2r + h
    q = jnp.stack(parts, axis=-2)  # [.., t, 64, 8, n]
    q = q.reshape(*lead, t, 64, 4, 2, n)  # [.., r, j, h, n]
    q = jnp.moveaxis(q, -3, -4)  # [.., t, j, r, h, n]
    return q.reshape(*lead, t, 512, n)


def pack_codes(q: jax.Array, bits: int) -> jax.Array:
    """Plane-paired pack of int codes [.., K, N] -> uint32 [.., K//ep, N].

    int4: one plane set per 512-row tile (see :func:`_pack4_planes`).
    int8: each code splits into nibbles ``lo = q & 15`` / ``hi = q >> 4``;
    per 512-row tile the lo nibbles pack as an int4 tile at word rows
    [128t, 128t+64) and the hi nibbles at [128t+64, 128t+128) — the kernel
    processes the hi plane with scale*16 so an int8 matmul reuses the int4
    unpack path unchanged.
    """
    ep = 32 // bits
    k, n = q.shape[-2], q.shape[-1]
    assert k % PACK_TILE_K == 0, k
    t = k // PACK_TILE_K
    lead = q.shape[:-2]
    qt = q.reshape(*lead, t, PACK_TILE_K, n)
    if bits == 4:
        word = _pack4_planes(qt)  # [.., t, 64, n]
    else:  # bits == 8
        lo = _pack4_planes(qt & 0xF)
        hi = _pack4_planes((qt >> 4) & 0xF)
        word = jnp.concatenate([lo, hi], axis=-2)  # [.., t, 128, n]
    kpt = PACK_TILE_K // ep
    return word.reshape(*lead, t * kpt, n)


def unpack_codes(packed: jax.Array, bits: int) -> jax.Array:
    """Inverse of :func:`pack_codes` -> int32 codes [.., K, N]."""
    ep = 32 // bits
    kp, n = packed.shape[-2], packed.shape[-1]
    kpt = PACK_TILE_K // ep
    t = kp // kpt
    lead = packed.shape[:-2]
    word = packed.reshape(*lead, t, kpt, n)
    if bits == 4:
        q = _unpack4_planes(word)
    else:  # bits == 8
        lo = _unpack4_planes(word[..., :64, :])
        hi = _unpack4_planes(word[..., 64:, :])
        q = lo | (hi << 4)
    return q.reshape(*lead, t * PACK_TILE_K, n)


def quantize(
    w: jax.Array, group_size: int = 64, bits: int = 4
) -> QuantizedTensor:
    """Quantize a weight matrix ``w`` [K, N] (KN layout) along K."""
    if bits not in SUPPORTED_BITS:
        raise ValueError(f"bits must be one of {SUPPORTED_BITS}, got {bits}")
    if group_size not in SUPPORTED_GROUPS:
        raise ValueError(
            f"group_size must be one of {SUPPORTED_GROUPS}, got {group_size}"
        )
    k, n = w.shape
    wp = _pad_k(w, PACK_TILE_K)
    q, scales, biases = compute_qparams(wp, group_size, bits)
    packed = pack_codes(q, bits)
    return QuantizedTensor(
        packed=packed,
        scales=scales,
        biases=biases,
        bits=bits,
        group_size=group_size,
        shape=(k, n),
    )


def dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Materialize the full weight [K, N] (un-padded)."""
    q = unpack_codes(qt.packed, qt.bits).astype(jnp.float32)
    g = qt.group_size
    s = jnp.repeat(qt.scales.astype(jnp.float32), g, axis=-2)
    b = jnp.repeat(qt.biases.astype(jnp.float32), g, axis=-2)
    w = q * s + b
    return w[..., : qt.shape[0], :].astype(dtype)


def quantize_mlx_layout(
    w_nk: jax.Array, group_size: int = 64, bits: int = 4
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Quantize an [N, K] matrix along K into the reference's MLX layout:
    consecutive LSB-first packing, packed [N, K//ep] uint32, scales/biases
    [N, K//g]. Provided for checkpoint interchange tests."""
    q, scales, biases = compute_qparams(
        w_nk.swapaxes(-1, -2), group_size, bits
    )
    q = q.swapaxes(-1, -2).astype(jnp.uint32)  # [N, K]
    ep = 32 // bits
    n, k = q.shape[-2], q.shape[-1]
    qw = q.reshape(*q.shape[:-1], k // ep, ep)
    word = jnp.zeros(qw.shape[:-1], jnp.uint32)
    for i in range(ep):
        word = word | (qw[..., i] << jnp.uint32(bits * i))
    return word, scales.swapaxes(-1, -2), biases.swapaxes(-1, -2)


def from_mlx_layout(
    packed_nk: jax.Array,
    scales_nk: jax.Array,
    biases_nk: jax.Array,
    group_size: int,
    bits: int,
) -> QuantizedTensor:
    """Convert reference/MLX-layout quantized weights ([N, K//ep] packed along
    K, consecutive LSB-first) into our tile-strided KN layout."""
    ep = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    n = packed_nk.shape[-2]
    kp = packed_nk.shape[-1]
    k = kp * ep
    parts = [
        ((packed_nk >> jnp.uint32(bits * i)) & mask).astype(jnp.int32)
        for i in range(ep)
    ]
    q_nk = jnp.stack(parts, axis=-1).reshape(*packed_nk.shape[:-1], k)
    q_kn = q_nk.swapaxes(-1, -2)
    pad = (-k) % PACK_TILE_K
    if pad:
        q_kn = jnp.pad(q_kn, [(0, pad), (0, 0)])
        scales_kn = jnp.pad(
            scales_nk.swapaxes(-1, -2), [(0, pad // group_size), (0, 0)]
        )
        biases_kn = jnp.pad(
            biases_nk.swapaxes(-1, -2), [(0, pad // group_size), (0, 0)]
        )
    else:
        scales_kn = scales_nk.swapaxes(-1, -2)
        biases_kn = biases_nk.swapaxes(-1, -2)
    return QuantizedTensor(
        packed=pack_codes(q_kn, bits),
        scales=scales_kn,
        biases=biases_kn,
        bits=bits,
        group_size=group_size,
        shape=(k, n),
    )


# ---------------------------------------------------------------------------
# Matmul
# ---------------------------------------------------------------------------


# auto-route quantized matmuls with M >= this many rows to the XLA
# dequant+dot path (0 = always use the Pallas kernel); flipped by the
# hardware A/B in benchmarks/trace_prefill.py
import os as _os

PREFILL_XLA_M = int(_os.environ.get("PIE_PREFILL_XLA_M", "0"))


def _matmul_xla(x: jax.Array, qt: QuantizedTensor) -> jax.Array:
    """Reference/fallback path: dequantize + dense dot (XLA fuses what it
    can). Used on CPU and as the numerical baseline for the Pallas kernel."""
    w = dequantize(qt, dtype=jnp.bfloat16)
    return jnp.dot(
        x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def quantized_matmul(
    x: jax.Array,
    qt: QuantizedTensor,
    impl: Optional[str] = None,
    layer: Optional[jax.Array] = None,
    rope_cs=None,
    rope_dim: int = 0,
    ln_w: Optional[jax.Array] = None,
    ln_eps: float = 0.0,
) -> jax.Array:
    """``y = x @ W`` with W group-wise quantized in KN layout.

    x: [..., K]; returns [..., N].
    impl: 'pallas' (TPU fused dequant+matmul), 'xla' (dequant + dot), or None
    to auto-select by backend.
    layer: for layer-stacked weights ([L, ...] arrays), the (traced) layer
    index — the Pallas kernel DMAs the selected layer's blocks straight
    from HBM with no slice copy (see quant_matmul_stacked).
    rope_cs/rope_dim: fused-QKV rope epilogue — (cos, sin) [M, N] rows from
    ops/rope.py:rope_qkv_cs plus the head_dim; applied inside the Pallas
    kernel (free on the HBM-bound decode path) or as one fused elementwise
    pass after the XLA fallback dot.
    """
    stacked = qt.packed.ndim == 3
    if stacked and layer is None:
        raise ValueError("stacked QuantizedTensor needs a layer index")
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        m_rows = 1
        for d in x.shape[:-1]:
            m_rows *= d
        if (
            impl == "pallas" and PREFILL_XLA_M and m_rows >= PREFILL_XLA_M
            and rope_dim == 0 and ln_w is None
        ):
            # prefill-sized M: dequantize-to-bf16 + dense MXU dot can beat
            # the fused kernel (A/B'd on hardware; see PROFILE.md round 5)
            impl = "xla"
    if impl == "pallas" and qt.shape[1] % 128 != 0:
        # sub-lane-tile output dims (tiny test models) -> XLA fallback
        impl = "xla"
    k = qt.shape[0]
    batch_shape = x.shape[:-1]
    xm = x.reshape(-1, x.shape[-1])
    if impl == "pallas":
        from pie_tpu.ops.quant_matmul_pallas import (
            quant_matmul_pallas,
            quant_matmul_stacked,
        )

        if k != qt.padded_k:
            xm = jnp.pad(xm, [(0, 0), (0, qt.padded_k - k)])
        if stacked:
            y = quant_matmul_stacked(
                xm, layer, qt, rope_cs=rope_cs, rope_dim=rope_dim,
                ln_w=ln_w, ln_eps=ln_eps,
            )
        else:
            y = quant_matmul_pallas(
                xm, qt, rope_cs=rope_cs, rope_dim=rope_dim,
                ln_w=ln_w, ln_eps=ln_eps,
            )
    elif impl == "xla":
        if ln_w is not None:
            # prologue parity for the fallback: normalize before the dot
            lw = (
                jax.lax.dynamic_index_in_dim(ln_w, layer, 0, False)
                if stacked and ln_w.ndim == 2 else ln_w.reshape(-1)
            )
            xf = xm.astype(jnp.float32)
            inv = jax.lax.rsqrt(
                jnp.mean(xf * xf, axis=-1, keepdims=True) + ln_eps
            )
            xm = (xf * inv * lw.astype(jnp.float32)).astype(xm.dtype)
        if stacked:
            qt = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, False),
                qt,
            )
        y = _matmul_xla(xm, qt)
        if rope_dim:
            from pie_tpu.ops.rope import apply_rope_cs

            y = apply_rope_cs(y, rope_cs[0], rope_cs[1], rope_dim)
    else:
        raise ValueError(f"unknown impl {impl!r}")
    return y.reshape(*batch_shape, qt.shape[1])
