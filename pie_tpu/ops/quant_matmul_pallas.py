"""Fused dequantize + matmul Pallas TPU kernel.

Computes ``y = x @ W`` where W is a group-wise affine quantized
:class:`~pie_tpu.ops.quant.QuantizedTensor` in KN layout (see
``pie_tpu/ops/quant.py`` for the plane-paired packing contract).

Design (TPU-first, replaces the reference's quantized_matmul usage at
models/base.py:56-89 which relied on MLX's fused kernels):

The decode step is HBM-bandwidth-bound in theory but VPU-bound in naive
kernels: every dequantized element costs unpack + convert + scale + bias ops
on the 8x128 vector unit, which caps throughput near 300 GB/s on v5e — far
below the 819 GB/s HBM roofline. This kernel gets the per-element VPU work
down to ~2.5 ops:

- **bit-trick unpack (1.5 ops/elem)**: codes are packed so that one
  shift + mask + or per 128-row plane places each nibble at mantissa bits
  3-6 of a bf16 with exponent 0 — after a free u32->bf16 bitcast every
  word yields *two* exact values ``1 + n/16``. No int->float convert, no
  re-centering pass: because the code sits at the TOP of the mantissa, the
  subsequent bf16 scale product rounds at 2^-9 of ~2*16*scale ~ 0.06*scale
  — the same error as multiplying the bare code, with zero extra ops.
- **scale only, no bias (1 op/elem)**: each plane is multiplied by
  ``16*scale`` rows (sublane-broadcast); the affine bias — including the
  -16*scale offset that converts ``1 + n/16`` back to ``n`` — is applied
  as one tiny f32 MXU dot against per-group sums of x, never touching the
  [K, N] stream.
- int8 weights are stored as two int4 nibble planes (see pack_codes); the
  hi plane runs through the same path with ``scale*256``.

Grid = (M tiles, N tiles, K tiles), K innermost, f32 accumulator in VMEM.
Weights stacked along a leading layer axis are indexed inside the kernel via
a scalar-prefetch layer id, so a ``lax.scan`` over layers streams each
layer's blocks straight from HBM with no gather/copy of the slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pie_tpu.ops.quant import PACK_TILE_K, QuantizedTensor

# Default tile sizes (prefill / large-M). Decode-sized calls override.
# Round-5 hardware sweep (in the real _prefill program, not isolated —
# isolated timings through the dispatch tunnel are untrustworthy): the
# old 256/512/512 ran an M=512 8B pass at 183 ms; 512/1024/2048 runs it
# at 115 ms (M=256: 96 -> 66 ms). bm covers M up to 512 in one m-tile
# (each m-tile re-streams + re-unpacks every weight block); bigger bn/bk
# cut grid-step count so the VPU unpack serializes against fewer, deeper
# MXU dots. bn=2048 at prefill bm OOMs scoped VMEM (16 MB) — the
# temporaries term below keeps _fit_tiles honest about that.
DEFAULT_BM = int(__import__("os").environ.get("PIE_PREFILL_BM", "512"))
DEFAULT_BN = int(__import__("os").environ.get("PIE_PREFILL_BN", "1024"))
DEFAULT_BK = int(__import__("os").environ.get("PIE_PREFILL_BK", "2048"))
# Decode (small M): bn=2048 / bk=2048 is the general-purpose optimum
# (differential-timed sweeps on v5e, benchmarks/sweep_tiles.py). Specific
# shapes beat it with exact few-tile splits — the round-4 sweep reads
# wqkv (4096x6144) at 807 GB/s (98.5% of HBM peak) with bn=3072 (two
# exact j-tiles) vs 571-688 at other tiles; wo/wgu/wd stay at the
# default. Per-shape overrides keyed by (padded_k, n):
DECODE_BN = 2048
DECODE_BK = 2048
# Round-4 lesson: isolated differential sweeps rated wqkv at 807 GB/s
# with bn=3072 (vs 571-688 otherwise), but IN-MODEL the per-shape tiles
# measured neutral-to-slightly-worse (6.755 vs 6.685 ms/tok paired) —
# back-to-back scan timing lets consecutive calls overlap in ways the
# real decode program (kernels interleaved with attention/cache ops)
# does not. Round-5 re-test with the decode-aware VMEM model unlocked
# bn=4096 blocks (ab_decode, same-process): wgu/wd at 4096x2048 read
# +0.09% and adding wqkv/wo overrides +0.41% — worse again. The defaults
# stand; keep the table empty until an in-model paired win exists.
DECODE_TILES: dict = {}
# scoped-VMEM budget for tile selection: 16 MB hardware limit less slack
# for Mosaic's own scratch
VMEM_BUDGET = 14 * 1024 * 1024
# stacked-weight rms-norm prologue: select the layer's ln row via the
# scalar-prefetched block index map (1) vs an XLA dynamic-slice launch per
# layer outside the kernel (0). Same-process A/B on 8B decode (ab_decode):
# the BlockSpec route is 1.5% SLOWER (6800 vs 6698 us/step, both reps
# within 1 us) — a scalar-prefetch-dependent index map defeats Mosaic's
# revisited-block caching, so the 8 KB ln row is re-DMA'd every grid step
# of both ln-carrying kernels, costing more than the two XLA slice
# launches it removes. Default stays 0.
LN_BLOCKSPEC = int(__import__("os").environ.get("PIE_LN_BLOCKSPEC", "0"))


def _tile_vmem_bytes(bm: int, bn: int, bk: int, ep: int, g: int) -> int:
    """Estimated VMEM bytes for one grid step (inputs double-buffered)."""
    packed = (bk // ep) * bn * 4 * 2
    scales = (bk // g) * bn * 4 * 2 * 2  # scales + biases
    x = bm * bk * 2 * 2
    acc = bm * bn * 4
    out = bm * bn * 2 * 2
    if bm <= 32 and g >= 64:
        # decode post-scale path (_accum_block): codes stay per-plane
        # [128, bn] bf16 and dot unscaled — only a few plane-sized
        # temporaries are ever live, so bn=4096 decode tiles fit
        temps = 128 * bn * 2 * 4
    else:
        # prefill dequantizes per-element and concatenates the full
        # [512, bn] bf16 tile; measured: bn=2048 prefill tiles exceed the
        # 16 MB scoped limit without this term
        temps = PACK_TILE_K * bn * 2 * 3
    return packed + scales + x + acc + out + temps


def _fit_tiles(bm: int, bn: int, bk: int, ep: int, g: int) -> tuple[int, int]:
    """Shrink (bk, then bn) until the grid step fits the VMEM budget."""
    while _tile_vmem_bytes(bm, bn, bk, ep, g) > VMEM_BUDGET and bk > PACK_TILE_K:
        bk //= 2
    while _tile_vmem_bytes(bm, bn, bk, ep, g) > VMEM_BUDGET and bn > 256:
        bn //= 2
    return bn, bk

def _plane_codes(pk, j):
    """Extract plane j of a packed word block [64, bn] -> exact bf16 values
    ``1 + n/16`` with shape [128, bn] (code n at mantissa bits 3-6)."""
    mask4 = jnp.uint32(0x00780078)
    expo = jnp.uint32(0x3F803F80)  # bf16 1.0 exponent bits in both halves
    # nibble j sits at bits (4j, 16+4j); move it to bits (3..6, 19..22)
    w = (pk << jnp.uint32(3)) if j == 0 else (pk >> jnp.uint32(4 * j - 3))
    u = (w & mask4) | expo
    return pltpu.bitcast(u, jnp.bfloat16)  # rows interleave: 2r | 2r+1


def _row_repeat(a: jax.Array, r: int) -> jax.Array:
    """Repeat each row of [G, N] r times -> [G*r, N] (broadcast + reshape)."""
    g, n = a.shape
    return jnp.broadcast_to(a[:, None, :], (g, r, n)).reshape(g * r, n)


def _rope_epilogue(y: jax.Array, cos: jax.Array, sin: jax.Array,
                   half: int) -> jax.Array:
    """Rotate dh-aligned head groups of the f32 tile y [bm, bn] in place:
    ``y*cos + roll_half(y)*sin`` with the rotate-half sign carried by sin
    (see ops/rope.py:rope_qkv_cs). Requires (2*half) | bn so the lane roll
    never crosses a head (or tile) boundary on any SELECTED lane — rolled
    wrap-around values land only on lanes the where() discards."""
    dh = 2 * half
    bn = y.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    fwd = pltpu.roll(y, bn - half, 1)   # fwd[l] = y[(l + half) % bn]
    bwd = pltpu.roll(y, half, 1)        # bwd[l] = y[(l - half) % bn]
    r = jnp.where(lane % dh < half, fwd, bwd)
    return y * cos + r * sin


def _accum_block(xb, packed_ref, scales_ref, biases_ref, acc, *,
                 bits: int, group_size: int, bk: int, bm: int):
    """Accumulate ``xb @ dequant(packed block)`` into the f32 value ``acc``.

    xb: [bm, bk] bf16 value; packed_ref/scales_ref/biases_ref: VMEM refs of
    one [bk//ep, bn] / [bk//g, bn] weight block. Shared by the plain matmul
    kernel and the fused decode-layer kernels (ops/fused_mlp_pallas.py)."""
    g = group_size
    gpt = PACK_TILE_K // g  # groups per 512-row tile
    n_tiles = bk // PACK_TILE_K
    wrows = 64 if bits == 4 else 128  # packed word rows per tile
    # Decode (small M): dot each group's codes unscaled and apply the group
    # scale to the [bm, bn] f32 partial AFTER the MXU — zero per-element
    # scale work on the VPU and EXACT affine dequant (bf16 products of
    # exact code values accumulate in f32; the scale multiplies in f32).
    # For large M (prefill) the post-scale would cost ops on [bm, bn] per
    # group, so dequantize per-element instead (MXU-bound there anyway).
    post_scale = bm <= 32 and g >= 64
    # Round-5 negative result: removing the bias stream + bias dot
    # ENTIRELY (hardware probe) saved only 136 us of the 6423 us 8B
    # decode step (2.1%), so merging scales+biases into one interleaved
    # operand to halve the side-stream DMA count cannot buy more than
    # ~1% — not worth the storage-layout change. The packed stream and
    # its VPU/MXU consumption set the plateau.

    if bits == 4:
        plane_sets = ((0, 16.0),)
    else:
        plane_sets = ((0, 16.0), (64, 256.0))
    spp = max(1, 128 // g)  # scale rows per 128-row plane

    def tile_scales(t):
        s32 = scales_ref[t * gpt:(t + 1) * gpt, :].astype(jnp.float32)
        b32 = biases_ref[t * gpt:(t + 1) * gpt, :].astype(jnp.float32)
        if bits == 4:
            # kernel codes are t = 1 + n/16: w = n*s + b = 16s*t + (b - 16s)
            b_eff = b32 - 16.0 * s32
        else:
            # n = lo + 16*hi: w = 16s*t_lo + 256s*t_hi + (b - 272 s)
            b_eff = b32 - 272.0 * s32
        return s32, b_eff

    def bias_dot(t, s32, b_eff, acc):
        # per-group sums of x for the bias dot: [bm, gpt]
        xt_f32 = xb[:, t * PACK_TILE_K:(t + 1) * PACK_TILE_K].astype(
            jnp.float32
        )
        xg = jnp.concatenate(
            [
                xt_f32[:, i * g:(i + 1) * g].sum(axis=1, keepdims=True)
                for i in range(gpt)
            ],
            axis=1,
        )
        # HIGHEST precision: this f32 dot must not drop to a single bf16
        # MXU pass — b_eff carries the 16s offset correction whose bf16
        # rounding would put ~0.03*scale of noise on every weight
        return acc + jnp.dot(
            xg, b_eff, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    if post_scale:
        for t in range(n_tiles):
            s32, b_eff = tile_scales(t)
            acc = bias_dot(t, s32, b_eff, acc)
            for row0, smul in plane_sets:
                pk = packed_ref[t * wrows + row0: t * wrows + row0 + 64, :]
                s_eff = s32 * smul  # [gpt, bn] f32
                for j in range(4):
                    codes = _plane_codes(pk, j)  # [128, bn] bf16, 1 + n/16
                    for i in range(spp):
                        grow = (128 * j) // g + i
                        xs_ = xb[:, t * PACK_TILE_K + 128 * j + i * g:
                                 t * PACK_TILE_K + 128 * j + (i + 1) * g]
                        part = jnp.dot(
                            xs_, codes[i * g:(i + 1) * g, :],
                            preferred_element_type=jnp.float32,
                        )
                        acc = acc + part * s_eff[grow][None, :]
        return acc

    # Prefill (large M): dequantize per-element, then ONE deep dot per
    # 512-row tile — shallow per-plane dots left the MXU at ~19%
    # utilization; a K=512 dot amortizes the systolic fill. KNOWN CEILING
    # (round-5 trace): all four prefill matmuls sit at ~35% MXU, exactly
    # the serial-VPU-then-MXU model (dequant ~1.8 us/tile + dot ~2
    # us/tile). Emitting tile t+1's dequant BEFORE tile t's dot in
    # program order was A/B'd on hardware and produced a bit-identical
    # optimized program — XLA/Mosaic scheduling is jaxpr-order-invariant,
    # so the VPU/MXU serialization is the Mosaic scheduler's choice and
    # not addressable from this level.
    def prep(t):
        s32, b_eff = tile_scales(t)
        wds = []
        for row0, smul in plane_sets:
            pk = packed_ref[t * wrows + row0: t * wrows + row0 + 64, :]
            s128 = (s32 * smul).astype(jnp.bfloat16)  # [gpt, bn]
            planes = []
            for j in range(4):
                codes = _plane_codes(pk, j)
                if g >= 128:
                    srow = s128[(128 * j) // g][None, :]
                    planes.append(codes * srow)
                else:
                    srep = _row_repeat(
                        s128[j * spp:(j + 1) * spp, :], g
                    )  # [128, bn]
                    planes.append(codes * srep)
            wds.append(jnp.concatenate(planes, axis=0))  # [512, bn]
        return s32, b_eff, wds

    for t in range(n_tiles):
        s32, b_eff, wds = prep(t)
        acc = bias_dot(t, s32, b_eff, acc)
        xt = xb[:, t * PACK_TILE_K:(t + 1) * PACK_TILE_K]
        for wd in wds:
            acc = acc + jnp.dot(xt, wd, preferred_element_type=jnp.float32)
    return acc


def _kernel(x_ref, packed_ref, scales_ref, biases_ref, out_ref, acc_ref, *,
            bits: int, group_size: int, bk: int, bm: int, out_dtype,
            cos_ref=None, sin_ref=None, rope_half: int = 0,
            lnw_ref=None, ln_eps: float = 0.0, ln_k: int = 0):
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if lnw_ref is not None:
        # rms-norm prologue: x_ref holds the FULL pre-norm row (index map
        # pins the K block to 0), so the row statistic is exact; the pad
        # region is zero and ln_k carries the logical K for the mean.
        # Recomputing the reduction per grid step costs ~bm*K VPU ops —
        # noise next to the packed-weight stream — and deletes the
        # standalone XLA rms_norm between the MLP-block kernel and this
        # projection (one fewer launch per layer).
        xf = x_ref[:].astype(jnp.float32)
        inv = jax.lax.rsqrt(
            jnp.sum(xf * xf, axis=-1, keepdims=True) / ln_k + ln_eps
        )
        xsl = x_ref[:, pl.ds(kk * bk, bk)].astype(jnp.float32)
        # stacked path delivers a [1, 1, kpad] layer-indexed block (3D:
        # Mosaic forbids slicing the size-1 sublane dim of the ref, so
        # load through full indices instead)
        wsl = (
            lnw_ref[0, 0, pl.ds(kk * bk, bk)]
            if len(lnw_ref.shape) == 3
            else lnw_ref[0, pl.ds(kk * bk, bk)]
        ).astype(jnp.float32)
        xb = (xsl * inv * wsl[None, :]).astype(jnp.bfloat16)
    else:
        xb = x_ref[:].astype(jnp.bfloat16)
    acc_ref[:] = _accum_block(
        xb, packed_ref, scales_ref, biases_ref, acc_ref[:],
        bits=bits, group_size=group_size, bk=bk, bm=bm,
    )

    @pl.when(kk == nk - 1)
    def _():
        y = acc_ref[:]
        if rope_half:
            y = _rope_epilogue(y, cos_ref[:], sin_ref[:], rope_half)
        out_ref[:] = y.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bm", "bn", "bk", "rope_dim", "ln_eps", "interpret"),
)
def quant_matmul_pallas(
    x: jax.Array,
    qt: QuantizedTensor,
    bm: int | None = None,
    bn: int | None = None,
    bk: int | None = None,
    rope_cs=None,
    rope_dim: int = 0,
    ln_w: jax.Array | None = None,
    ln_eps: float = 0.0,
    interpret: bool = False,
) -> jax.Array:
    """x: [M, K_padded] -> [M, N]. K_padded = qt.padded_k.

    rope_cs/rope_dim: optional fused-QKV rope epilogue — (cos, sin) rows
    [M, N] from ops/rope.py:rope_qkv_cs and the head_dim; the rotation is
    applied to the f32 accumulator before the output cast, costing nothing
    on the HBM-bound decode path.

    ln_w/ln_eps: optional fused rms-norm prologue (decode-sized M): x is
    the pre-norm row; used to fold the final norm into the lm_head stream."""
    m, kpad = x.shape
    assert kpad == qt.padded_k, (kpad, qt.padded_k)
    n = qt.shape[1]
    ep = qt.el_per_int
    g = qt.group_size

    decode = m <= 32
    auto_tiles = bn is None and bk is None
    if bm is None:
        bm = DEFAULT_BM
    if bn is None:
        bn = DECODE_BN if decode else DEFAULT_BN
    if bk is None:
        bk = DECODE_BK if decode else DEFAULT_BK
    if decode and auto_tiles and (qt.padded_k, n) in DECODE_TILES:
        bn, bk = DECODE_TILES[(qt.padded_k, n)]
    assert bk % PACK_TILE_K == 0

    bm = min(bm, _round_up(m, 8))
    bn = min(bn, _round_up(n, 128))
    # scales/biases blocks are [bk//g, bn]; sublane dim must be a multiple of
    # 8 or span the whole array, so cover at least 8 groups per K tile.
    bk = min(max(bk, 8 * g), kpad)
    bn, bk = _fit_tiles(bm, bn, bk, ep, g)
    if rope_dim:
        assert rope_cs is not None and bn % rope_dim == 0, (bn, rope_dim)
    use_ln = ln_w is not None
    if use_ln:
        assert decode, "ln prologue is decode-only (full-row x block)"
        ln_w = ln_w.reshape(1, -1)
        if ln_w.shape[-1] < kpad:
            ln_w = jnp.pad(ln_w, ((0, 0), (0, kpad - ln_w.shape[-1])))

    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), pl.cdiv(kpad, bk))

    kernel = functools.partial(
        _kernel, bits=qt.bits, group_size=g, bk=bk, bm=bm, out_dtype=x.dtype,
        rope_half=rope_dim // 2,
        ln_eps=ln_eps, ln_k=qt.shape[0] if use_ln else 0,
    )
    base = kernel
    if rope_dim and use_ln:
        def kernel(x_ref, packed_ref, scales_ref, biases_ref, cos_ref,
                   sin_ref, lnw_ref, out_ref, acc_ref):
            base(x_ref, packed_ref, scales_ref, biases_ref, out_ref, acc_ref,
                 cos_ref=cos_ref, sin_ref=sin_ref, lnw_ref=lnw_ref)
    elif rope_dim:
        def kernel(x_ref, packed_ref, scales_ref, biases_ref, cos_ref,
                   sin_ref, out_ref, acc_ref):
            base(x_ref, packed_ref, scales_ref, biases_ref, out_ref, acc_ref,
                 cos_ref=cos_ref, sin_ref=sin_ref)
    elif use_ln:
        def kernel(x_ref, packed_ref, scales_ref, biases_ref, lnw_ref,
                   out_ref, acc_ref):
            base(x_ref, packed_ref, scales_ref, biases_ref, out_ref, acc_ref,
                 lnw_ref=lnw_ref)

    flops = 2 * m * n * kpad
    bytes_accessed = (
        kpad * n // ep * 4 + 2 * (kpad // g) * n * qt.scales.dtype.itemsize
        + m * kpad * x.dtype.itemsize + m * n * x.dtype.itemsize
    )
    in_specs = [
        pl.BlockSpec(
            (bm, kpad if use_ln else bk),
            (lambda i, j, k: (i, 0)) if use_ln else (lambda i, j, k: (i, k)),
        ),
        pl.BlockSpec((bk // ep, bn), lambda i, j, k: (k, j)),
        pl.BlockSpec((bk // g, bn), lambda i, j, k: (k, j)),
        pl.BlockSpec((bk // g, bn), lambda i, j, k: (k, j)),
    ]
    operands = [x, qt.packed, qt.scales, qt.biases]
    if rope_dim:
        in_specs += [
            pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        ]
        operands += [rope_cs[0], rope_cs[1]]
    if use_ln:
        in_specs += [pl.BlockSpec((1, kpad), lambda i, j, k: (0, 0))]
        operands += [ln_w]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
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
    )(*operands)


def _stacked_index_maps():
    """Index maps for stacked [L, ...] weights: grid ids first, then the
    scalar-prefetch ref holding the layer id."""
    return (
        lambda i, j, k, s: (i, k),          # x
        lambda i, j, k, s: (s[0], k, j),    # packed
        lambda i, j, k, s: (s[0], k, j),    # scales
        lambda i, j, k, s: (s[0], k, j),    # biases
    )


@functools.partial(
    jax.jit,
    static_argnames=("bm", "bn", "bk", "rope_dim", "ln_eps", "interpret"),
)
def quant_matmul_stacked(
    x: jax.Array,
    layer: jax.Array,
    qt: QuantizedTensor,
    bm: int | None = None,
    bn: int | None = None,
    bk: int | None = None,
    rope_cs=None,
    rope_dim: int = 0,
    ln_w: jax.Array | None = None,
    ln_eps: float = 0.0,
    interpret: bool = False,
) -> jax.Array:
    """``y = x @ W[layer]`` for layer-stacked quantized weights.

    qt holds packed [L, Kp, N] / scales / biases [L, G, N]; ``layer`` is a
    scalar int32. The layer id is scalar-prefetched so block DMAs read the
    selected layer's tiles straight from HBM — a ``lax.scan`` over layers
    pays zero slice-copy (the naive ``scan`` over stacked weights
    materializes each layer's [K, N] slice before a plain kernel can read
    it, doubling HBM traffic).

    ln_w/ln_eps: optional fused rms-norm prologue — ln_w is the stacked
    [L, K] norm weight; x is then the PRE-NORM residual stream and the
    kernel normalizes it in-register (decode-sized M only), deleting the
    standalone XLA rms_norm launch per layer.
    """
    m, kpad = x.shape
    assert qt.packed.ndim == 3, "use quant_matmul_pallas for unstacked weights"
    ep = qt.el_per_int
    assert kpad == qt.packed.shape[-2] * ep, (kpad, qt.packed.shape)
    n = qt.shape[1]
    g = qt.group_size

    decode = m <= 32
    auto_tiles = bn is None and bk is None
    if bm is None:
        bm = DEFAULT_BM
    if bn is None:
        bn = DECODE_BN if decode else DEFAULT_BN
    if bk is None:
        bk = DECODE_BK if decode else DEFAULT_BK
    if decode and auto_tiles and (kpad, n) in DECODE_TILES:
        bn, bk = DECODE_TILES[(kpad, n)]
    assert bk % PACK_TILE_K == 0
    bm = min(bm, _round_up(m, 8))
    bn = min(bn, _round_up(n, 128))
    bk = min(max(bk, 8 * g), kpad)
    bn, bk = _fit_tiles(bm, bn, bk, ep, g)
    if rope_dim:
        assert rope_cs is not None and bn % rope_dim == 0, (bn, rope_dim)
    use_ln = ln_w is not None
    if use_ln:
        assert decode, "ln prologue is decode-only (full-row x block)"
        if ln_w.shape[-1] < kpad:
            ln_w = jnp.pad(ln_w, ((0, 0), (0, kpad - ln_w.shape[-1])))
        # the layer's row is selected by the BLOCK index map from the
        # scalar-prefetched layer id ((1, 1, kpad) block of the stacked
        # [L, 1, Kp] view: trailing block dims equal the array dims, which
        # Mosaic requires) — no XLA slice launch per layer. NOTE: in-kernel
        # ref slicing (.at[l] on a [L, 1, Kp] operand) trips Mosaic's
        # sublane tiling; block-level indexing does not.
        if LN_BLOCKSPEC:
            ln_w = ln_w.reshape(ln_w.shape[0], 1, kpad)
        else:  # A/B fallback: slice outside the kernel
            ln_w = jax.lax.dynamic_index_in_dim(ln_w, layer, 0, keepdims=True)

    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), pl.cdiv(kpad, bk))
    kernel = functools.partial(
        _kernel, bits=qt.bits, group_size=g, bk=bk, bm=bm, out_dtype=x.dtype,
        rope_half=rope_dim // 2,
        ln_eps=ln_eps, ln_k=qt.shape[0] if use_ln else 0,
    )
    xmap, pmap, smap, bmap = _stacked_index_maps()
    if use_ln:
        xmap = lambda i, j, k, s: (i, 0)  # full-row block for the norm
    flops = 2 * m * n * kpad
    bytes_accessed = (
        kpad * n // ep * 4 + 2 * (kpad // g) * n * qt.scales.dtype.itemsize
        + m * kpad * x.dtype.itemsize + m * n * x.dtype.itemsize
    )
    in_specs = [
        pl.BlockSpec((bm, kpad if use_ln else bk), xmap),
        pl.BlockSpec((1, bk // ep, bn), pmap),
        pl.BlockSpec((1, bk // g, bn), smap),
        pl.BlockSpec((1, bk // g, bn), bmap),
    ]
    operands = [x, qt.packed, qt.scales, qt.biases]
    if rope_dim:
        in_specs += [
            pl.BlockSpec((bm, bn), lambda i, j, k, s: (i, j)),
            pl.BlockSpec((bm, bn), lambda i, j, k, s: (i, j)),
        ]
        operands += [rope_cs[0], rope_cs[1]]
    if use_ln:
        if LN_BLOCKSPEC:
            in_specs += [
                pl.BlockSpec((1, 1, kpad), lambda i, j, k, s: (s[0], 0, 0))
            ]
        else:
            in_specs += [pl.BlockSpec((1, kpad), lambda i, j, k, s: (0, 0))]
        operands += [ln_w]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, s: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )

    if rope_dim and use_ln:
        def kernel_stacked(s_ref, x_ref, packed_ref, scales_ref, biases_ref,
                           cos_ref, sin_ref, lnw_ref, out_ref, acc_ref):
            kernel(x_ref, packed_ref.at[0], scales_ref.at[0],
                   biases_ref.at[0], out_ref, acc_ref,
                   cos_ref=cos_ref, sin_ref=sin_ref, lnw_ref=lnw_ref)
    elif rope_dim:
        def kernel_stacked(s_ref, x_ref, packed_ref, scales_ref, biases_ref,
                           cos_ref, sin_ref, out_ref, acc_ref):
            kernel(x_ref, packed_ref.at[0], scales_ref.at[0],
                   biases_ref.at[0], out_ref, acc_ref,
                   cos_ref=cos_ref, sin_ref=sin_ref)
    elif use_ln:
        def kernel_stacked(s_ref, x_ref, packed_ref, scales_ref, biases_ref,
                           lnw_ref, out_ref, acc_ref):
            kernel(x_ref, packed_ref.at[0], scales_ref.at[0],
                   biases_ref.at[0], out_ref, acc_ref, lnw_ref=lnw_ref)
    else:
        def kernel_stacked(s_ref, x_ref, packed_ref, scales_ref, biases_ref,
                           out_ref, acc_ref):
            kernel(x_ref, packed_ref.at[0], scales_ref.at[0],
                   biases_ref.at[0], out_ref, acc_ref)

    return pl.pallas_call(
        kernel_stacked,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m
