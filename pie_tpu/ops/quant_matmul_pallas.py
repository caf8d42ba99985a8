"""Fused dequantize + matmul Pallas TPU kernel.

Computes ``y = x @ W`` where W is a group-wise affine quantized
:class:`~pie_tpu.ops.quant.QuantizedTensor` in KN layout (see
``pie_tpu/ops/quant.py`` for the tile-strided packing contract).

Design (TPU-first, replaces the reference's quantized_matmul usage at
models/base.py:56-89 which relied on MLX's fused kernels):

- grid = (M tiles, N tiles, K tiles), K innermost; f32 accumulator in VMEM
  scratch, written out once on the final K step.
- each K step streams a packed uint32 block from HBM and walks it one
  512-row pack tile at a time: VPU shifts unpack ``ep`` nibble blocks, a
  single sublane concatenate restores row order (the tile-strided pack makes
  that free), dequantization runs in bf16 (codes <= 255 are exact in bf16),
  and each pack tile feeds the MXU immediately — intermediates stay at
  [PACK_TILE_K, bn] so K/N tiles can be large. Decode-shaped calls (small M)
  use big K x N tiles: per-grid-step fixed costs, not bandwidth, dominate
  small-tile launches.
- bias is folded into the dequantized tile (w = q*s + b), so the dot
  produces the exact affine result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pie_tpu.ops.quant import PACK_TILE_K, QuantizedTensor

# Default tile sizes (prefill / large-M). Decode-sized calls override.
DEFAULT_BM = 256
DEFAULT_BN = 512
DEFAULT_BK = 512
# Decode (small M): fewer, larger grid steps.
DECODE_BN = 1024
DECODE_BK = 2048


def _kernel(x_ref, packed_ref, scales_ref, biases_ref, out_ref, acc_ref, *,
            bits: int, group_size: int, bk: int, out_dtype):
    ep = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    n_tiles = bk // PACK_TILE_K
    kpt = PACK_TILE_K // ep  # packed rows per pack tile
    gpt = PACK_TILE_K // group_size  # groups per pack tile

    xb = x_ref[:].astype(jnp.bfloat16)
    acc = acc_ref[:]
    for t in range(n_tiles):
        pk = packed_ref[t * kpt:(t + 1) * kpt, :]  # [kpt, bn] uint32
        parts = []
        for i in range(ep):
            nib = ((pk >> jnp.uint32(bits * i)) & mask).astype(jnp.int32)
            parts.append(nib.astype(jnp.bfloat16))
        wq = jnp.concatenate(parts, axis=0)  # [PACK_TILE_K, bn] bf16
        s = scales_ref[t * gpt:(t + 1) * gpt, :].astype(jnp.bfloat16)
        b = biases_ref[t * gpt:(t + 1) * gpt, :].astype(jnp.bfloat16)
        srep = _repeat_rows(s, group_size)
        brep = _repeat_rows(b, group_size)
        wd = wq * srep + brep
        xt = xb[:, t * PACK_TILE_K:(t + 1) * PACK_TILE_K]
        acc = acc + jnp.dot(xt, wd, preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(kk == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _repeat_rows(a: jax.Array, r: int) -> jax.Array:
    """Repeat each row of [G, N] r times -> [G*r, N] (broadcast + reshape)."""
    g, n = a.shape
    return jnp.broadcast_to(a[:, None, :], (g, r, n)).reshape(g * r, n)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def quant_matmul_pallas(
    x: jax.Array,
    qt: QuantizedTensor,
    bm: int | None = None,
    bn: int | None = None,
    bk: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """x: [M, K_padded] -> [M, N]. K_padded = qt.padded_k."""
    m, kpad = x.shape
    assert kpad == qt.padded_k, (kpad, qt.padded_k)
    n = qt.shape[1]
    ep = qt.el_per_int
    g = qt.group_size

    decode = m <= 32
    if bm is None:
        bm = DEFAULT_BM
    if bn is None:
        bn = DECODE_BN if decode else DEFAULT_BN
    if bk is None:
        bk = DECODE_BK if decode else DEFAULT_BK
    assert bk % PACK_TILE_K == 0

    bm = min(bm, _round_up(m, 8))
    bn = min(bn, _round_up(n, 128))
    # scales/biases blocks are [bk//g, bn]; sublane dim must be a multiple of
    # 8 or span the whole array, so cover at least 8 groups per K tile.
    bk = min(max(bk, 8 * g), kpad)

    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), pl.cdiv(kpad, bk))

    kernel = functools.partial(
        _kernel, bits=qt.bits, group_size=g, bk=bk, out_dtype=x.dtype
    )
    flops = 2 * m * n * kpad
    bytes_accessed = (
        kpad * n // ep * 4 + 2 * (kpad // g) * n * qt.scales.dtype.itemsize
        + m * kpad * x.dtype.itemsize + m * n * x.dtype.itemsize
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk // ep, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bk // g, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bk // g, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x, qt.packed, qt.scales, qt.biases)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m
