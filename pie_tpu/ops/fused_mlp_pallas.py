"""Fused decode MLP-block kernel: wo -> +residual -> rms_norm -> wgu ->
silu*mul -> wd -> +residual in ONE Pallas launch.

Why: the decode step is HBM-bound, but at batch<=8 each quantized matmul
launch pays ~2-5 us of dispatch + pipeline fill (the first packed block's
DMA is not overlapped). With 4 matmuls x 32 layers that fixed cost is
~0.4-0.5 ms/token on Llama-3-8B — the largest single residual after the
rope fusion (benchmarks/PROFILE.md). This kernel replaces the whole
post-attention stretch of a decoder layer (3 matmul launches + the norm /
residual / activation XLA fusions between them) with one program whose
phases pipeline into each other: while the wo phase computes, the wgu
phase's first block is already prefetching (its BlockSpec parks on block 0
during earlier phases).

Weight streams ride the same grid: a flat 1-D "arbitrary" grid enumerates
(phase, j, k) steps; index maps clamp each operand to a constant block
outside its phase so no DMA re-issues (Pallas only fetches when the block
index changes). Each phase uses its own K tile (wo streams at bk=1024, the
big wgu/wd streams at bk=2048 — the per-shape optima from the
sweep_tiles.py sweep), and all inter-phase activations live in VMEM as
BN-wide slabs.

Numerics intentionally match the unfused path bit-for-bit where it is
cheap: accumulators are f32, residual adds and the hidden stream are bf16,
the norm reduction is f32 (models/llama.py:rms_norm), silu runs in f32 on
bf16 inputs. The silu*mul for g-tile j runs as soon as u-tile j+n/2 lands
(not as a phase-end lump), so the VPU work hides under the weight DMAs.

Reference parity: this is the device program for the MLP half of the
reference's per-layer forward (models/llama/language.py attention+MLP
stack); the fusion itself has no reference analog (MLX fuses nothing
across module boundaries).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pie_tpu.ops.quant import QuantizedTensor
from pie_tpu.ops.quant_matmul_pallas import _accum_block

BN = 2048
BK_O = 1024   # wo K tile
BK_G = 2048   # wgu / wd K tile (== BN so VMEM slabs ARE the x tiles)


def fused_mlp_supported(qt_wo, qt_wgu, qt_wd, m: int) -> bool:
    """Static gate: decode-sized batch, tile-divisible dims, stacked
    weights with a shared group size."""
    try:
        d_attn, d = qt_wo.shape
        d2, di2 = qt_wgu.shape
        di, d3 = qt_wd.shape
    except Exception:
        return False
    return (
        m <= 8
        and qt_wo.packed.ndim == 3
        and d == d2 == d3
        and di2 == 2 * di
        and d % BN == 0 and di2 % BN == 0 and di % BK_G == 0
        and d_attn % BK_O == 0 and d % BK_G == 0
        and qt_wo.padded_k == d_attn and qt_wgu.padded_k == d
        and qt_wd.padded_k == di
        and qt_wo.group_size == qt_wgu.group_size == qt_wd.group_size
        and qt_wo.bits == qt_wgu.bits == qt_wd.bits
        and qt_wo.group_size <= BK_O
    )


def _mlp_kernel(
    s_ref, attn_ref, hin_ref, w_ref,
    wo_p, wo_s, wo_b, wgu_p, wgu_s, wgu_b, wd_p, wd_s, wd_b,
    out_ref, acc_ref, h2_ref, xg_ref, gu_ref, act_ref, *,
    bits, g, bm, eps, dims,
):
    d_attn, d, di = dims
    n_ko, n_jo = d_attn // BK_O, d // BN
    n_kg, n_jg = d // BK_G, (2 * di) // BN
    n_kd = di // BK_G
    n_wo = n_jo * n_ko
    n_wgu = n_jg * n_kg
    s = pl.program_id(0)

    kw = dict(bits=bits, group_size=g, bm=bm)

    # ---- phase 1: h2 = h_in + attn @ wo; xg = rms_norm(h2) * w ---------
    @pl.when(s < n_wo)
    def _():
        k = s % n_ko
        j = s // n_ko

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        xb = attn_ref[:].astype(jnp.bfloat16)
        acc_ref[:] = _accum_block(
            xb, wo_p.at[0], wo_s.at[0], wo_b.at[0], acc_ref[:], bk=BK_O,
            **kw
        )

        @pl.when(k == n_ko - 1)
        def _():
            h2_ref[j] = hin_ref[:] + acc_ref[:].astype(jnp.bfloat16)

        @pl.when(s == n_wo - 1)
        def _():
            ssq = jnp.zeros((bm, 1), jnp.float32)
            for t in range(n_jo):
                hf = h2_ref[t].astype(jnp.float32)
                ssq = ssq + (hf * hf).sum(axis=1, keepdims=True)
            inv = jax.lax.rsqrt(ssq / d + eps)
            for t in range(n_jo):
                wt = w_ref[:, t * BN:(t + 1) * BN].astype(jnp.float32)
                xg_ref[t] = (
                    h2_ref[t].astype(jnp.float32) * inv * wt
                ).astype(jnp.bfloat16)

    # ---- phase 2: gu = xg @ wgu; act = silu(g) * u (incremental) -------
    @pl.when((s >= n_wo) & (s < n_wo + n_wgu))
    def _():
        t0 = s - n_wo
        k = t0 % n_kg
        j = t0 // n_kg

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        xb = xg_ref[k]
        acc_ref[:] = _accum_block(
            xb, wgu_p.at[0], wgu_s.at[0], wgu_b.at[0], acc_ref[:], bk=BK_G,
            **kw
        )

        @pl.when(k == n_kg - 1)
        def _():
            gu_ref[j] = acc_ref[:].astype(jnp.bfloat16)
            # the matching g slab landed n_jg/2 tiles ago: activate now so
            # the silu VPU work hides under this step's weight DMAs
            @pl.when(j >= n_jg // 2)
            def _():
                gf = gu_ref[j - n_jg // 2].astype(jnp.float32)
                uf = gu_ref[j].astype(jnp.float32)
                act_ref[j - n_jg // 2] = (
                    gf * jax.nn.sigmoid(gf) * uf
                ).astype(jnp.bfloat16)

    # ---- phase 3: out = h2 + act @ wd ----------------------------------
    @pl.when(s >= n_wo + n_wgu)
    def _():
        t0 = s - n_wo - n_wgu
        k = t0 % n_kd
        j = t0 // n_kd

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        xb = act_ref[k]
        acc_ref[:] = _accum_block(
            xb, wd_p.at[0], wd_s.at[0], wd_b.at[0], acc_ref[:], bk=BK_G,
            **kw
        )

        @pl.when(k == n_kd - 1)
        def _():
            out_ref[:] = h2_ref[j] + acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_mlp_stacked(
    attn: jax.Array,  # [M, d_attn] bf16 (attention output, flattened heads)
    h_in: jax.Array,  # [M, d] bf16 residual stream
    ln2_w: jax.Array,  # [d] post-attention norm weight
    layer: jax.Array,  # scalar int32
    wo: QuantizedTensor,  # stacked [L, d_attn, d]
    wgu: QuantizedTensor,  # stacked [L, d, 2*di]
    wd: QuantizedTensor,  # stacked [L, di, d]
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """One-launch decode MLP block; returns h_out [M, d]."""
    m, d_attn = attn.shape
    d = wo.shape[1]
    di = wd.shape[0]
    bits, g = wo.bits, wo.group_size
    ep = wo.el_per_int
    bm = 8  # single M tile (decode)

    n_ko, n_jo = d_attn // BK_O, d // BN
    n_kg, n_jg = d // BK_G, (2 * di) // BN
    n_kd, n_jd = di // BK_G, d // BN
    n_wo = n_jo * n_ko
    n_wgu = n_jg * n_kg
    n_wd = n_jd * n_kd
    grid = (n_wo + n_wgu + n_wd,)

    # index maps: each operand walks its own (j, k) schedule during its
    # phase and parks on a constant block outside it. Parking wgu/wd on
    # block (0, 0) BEFORE their phase prefetches their first block during
    # the preceding phase — the phase transition pays no pipeline fill.
    def wo_idx(s, sr):
        return (sr[0], jnp.where(s < n_wo, s % n_ko, n_ko - 1),
                jnp.where(s < n_wo, s // n_ko, n_jo - 1))

    def wgu_idx(s, sr):
        t = s - n_wo
        k = jnp.where(s < n_wo, 0,
                      jnp.where(s < n_wo + n_wgu, t % n_kg, n_kg - 1))
        j = jnp.clip(t // n_kg, 0, n_jg - 1)
        return (sr[0], k, j)

    def wd_idx(s, sr):
        t = s - n_wo - n_wgu
        k = jnp.where(s < n_wo + n_wgu, 0, t % n_kd)
        j = jnp.clip(t // n_kd, 0, n_jd - 1)
        return (sr[0], k, j)

    def attn_idx(s, sr):
        return (0, jnp.where(s < n_wo, s % n_ko, n_ko - 1))

    def hin_idx(s, sr):
        return (0, jnp.where(s < n_wo, s // n_ko, n_jo - 1))

    def out_idx(s, sr):
        return (0, jnp.clip((s - n_wo - n_wgu) // n_kd, 0, n_jd - 1))

    in_specs = [
        pl.BlockSpec((bm, BK_O), attn_idx),
        pl.BlockSpec((bm, BN), hin_idx),
        pl.BlockSpec((1, d), lambda s, sr: (0, 0)),
        pl.BlockSpec((1, BK_O // ep, BN), wo_idx),
        pl.BlockSpec((1, BK_O // g, BN), wo_idx),
        pl.BlockSpec((1, BK_O // g, BN), wo_idx),
        pl.BlockSpec((1, BK_G // ep, BN), wgu_idx),
        pl.BlockSpec((1, BK_G // g, BN), wgu_idx),
        pl.BlockSpec((1, BK_G // g, BN), wgu_idx),
        pl.BlockSpec((1, BK_G // ep, BN), wd_idx),
        pl.BlockSpec((1, BK_G // g, BN), wd_idx),
        pl.BlockSpec((1, BK_G // g, BN), wd_idx),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, BN), out_idx),
        scratch_shapes=[
            pltpu.VMEM((bm, BN), jnp.float32),                 # acc
            pltpu.VMEM((d // BN, bm, BN), jnp.bfloat16),       # h2 slabs
            pltpu.VMEM((d // BN, bm, BN), jnp.bfloat16),       # xg slabs
            pltpu.VMEM((2 * di // BN, bm, BN), jnp.bfloat16),  # gu slabs
            pltpu.VMEM((di // BN, bm, BN), jnp.bfloat16),      # act slabs
        ],
    )
    kernel = functools.partial(
        _mlp_kernel, bits=bits, g=g, bm=bm, eps=eps, dims=(d_attn, d, di),
    )
    wbytes = (
        (d_attn * d + d * 2 * di + di * d) // ep * 4
        + 2 * ((d_attn // g) * d + (d // g) * 2 * di + (di // g) * d)
        * wo.scales.dtype.itemsize
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, d), h_in.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * (d_attn * d + d * 2 * di + di * d),
            bytes_accessed=wbytes, transcendentals=m * di,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        attn, h_in, ln2_w.reshape(1, d),
        wo.packed, wo.scales, wo.biases,
        wgu.packed, wgu.scales, wgu.biases,
        wd.packed, wd.scales, wd.biases,
    )
    return out
