"""Rotary position embeddings with Llama-3 frequency scaling.

Reference parity: the Llama3RoPE frequency-rescaling math of
models/llama/utils.py:26-50 and the RopeConfig surface of models/rope.py:5-58,
re-done as pure JAX (cos/sin computed from positions on the fly — no tables,
no gathers; XLA fuses this into the surrounding elementwise ops).

Convention: split-half rotation (rotate_half), matching HF Llama weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RopeScalingConfig:
    """Pydantic-free twin of the reference's RopeConfig (models/rope.py:5-47)."""

    rope_type: str = "default"
    factor: float = 1.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192

    @classmethod
    def from_dict(cls, d: Optional[dict[str, Any]]) -> "RopeScalingConfig":
        if not d:
            return cls()
        return cls(
            rope_type=d.get("rope_type", d.get("type", "default")),
            factor=float(d.get("factor", 1.0)),
            low_freq_factor=float(d.get("low_freq_factor", 1.0)),
            high_freq_factor=float(d.get("high_freq_factor", 4.0)),
            original_max_position_embeddings=int(
                d.get("original_max_position_embeddings", 8192)
            ),
        )


def make_inv_freq(
    head_dim: int,
    base: float = 10000.0,
    scaling: Optional[RopeScalingConfig] = None,
) -> np.ndarray:
    """Compute inverse frequencies [head_dim // 2] (numpy — static, host)."""
    inv_freq = 1.0 / (
        base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    if scaling is not None and scaling.rope_type in ("llama3",):
        # Llama-3 wavelength-dependent rescale (reference models/llama/utils.py:26-39)
        low_wl = scaling.original_max_position_embeddings / scaling.low_freq_factor
        high_wl = scaling.original_max_position_embeddings / scaling.high_freq_factor
        wl = 2 * np.pi / inv_freq
        smooth = (scaling.original_max_position_embeddings / wl - scaling.low_freq_factor) / (
            scaling.high_freq_factor - scaling.low_freq_factor
        )
        smoothed = (1 - smooth) * inv_freq / scaling.factor + smooth * inv_freq
        inv_freq = np.where(
            wl > low_wl,
            inv_freq / scaling.factor,
            np.where(wl < high_wl, inv_freq, smoothed),
        )
    return inv_freq.astype(np.float32)


def rope_tables(
    positions: jax.Array, inv_freq: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables [B, T, 1, D/2] for ``positions`` [B, T].

    Positions are identical for every decoder layer, so the hot loops
    compute these ONCE per step and pass them into the layer scan — the
    per-layer sin/cos recompute showed up as ~1.2 ms/token on the 8B decode
    ablation (norope saved 13% of the step; XLA does not hoist the
    transcendentals out of the scan body)."""
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [B, T, D/2]
    return jnp.cos(freqs)[..., None, :], jnp.sin(freqs)[..., None, :]


def apply_rope_tables(
    x: jax.Array, cos: jax.Array, sin: jax.Array
) -> jax.Array:
    """Rotate q or k with precomputed tables (split-half convention)."""
    d2 = x.shape[-1] // 2
    x1 = x[..., :d2].astype(jnp.float32)
    x2 = x[..., d2:].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def apply_rope(
    x: jax.Array, positions: jax.Array, inv_freq: jax.Array
) -> jax.Array:
    """Rotate q or k.

    x: [B, T, H, D]; positions: [B, T] int32; inv_freq: [D//2] f32.
    Returns same shape/dtype as x.
    """
    cos, sin = rope_tables(positions, inv_freq)
    return apply_rope_tables(x, cos, sin)


def rope_qkv_cs(
    positions: jax.Array, inv_freq: jax.Array, hq: int, hkv: int, dh: int
) -> tuple[jax.Array, jax.Array]:
    """Per-position cos/sin epilogue rows for a FUSED QKV projection.

    Returns (C, S) with shape [B, (hq + 2*hkv) * dh] f32 such that
    ``apply_rope_cs(y, C, S, dh)`` rotates the q and k column groups of the
    fused projection output and leaves the v columns untouched (C=1, S=0).
    The rotate-half sign lives in S (negative on each head's first half), so
    consumers only need ``y*C + roll_half(y)*S`` — the form the quantized
    matmul kernel applies as a free epilogue on its f32 accumulator
    (ops/quant_matmul_pallas.py), which removed the ~1.25 ms/token that
    standalone per-layer rope kernels cost on the 8B decode ablation.

    positions: [B] int32 (one position per row of the [B, N] projection).
    """
    b = positions.shape[0]
    freqs = positions[:, None].astype(jnp.float32) * inv_freq  # [B, dh/2]
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    cos_h = jnp.concatenate([cos, cos], axis=-1)  # [B, dh]
    sin_h = jnp.concatenate([-sin, sin], axis=-1)
    nrot = hq + hkv
    ones = jnp.ones((b, hkv * dh), jnp.float32)
    zeros = jnp.zeros((b, hkv * dh), jnp.float32)
    c = jnp.concatenate([jnp.tile(cos_h, (1, nrot)), ones], axis=-1)
    s = jnp.concatenate([jnp.tile(sin_h, (1, nrot)), zeros], axis=-1)
    return c, s


def apply_rope_cs(
    y: jax.Array, c: jax.Array, s: jax.Array, dh: int
) -> jax.Array:
    """Reference epilogue for :func:`rope_qkv_cs` (XLA fallback + tests).

    y: [B, N] fused projection output; c/s: [B, N] from rope_qkv_cs.
    Equivalent to split-half rotation per dh-sized head group: the rolled
    value y[l +/- dh/2] is selected per lane so the roll never crosses a
    head boundary (head groups are dh-aligned in the fused layout).
    """
    half = dh // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, y.ndim - 1)
    yf = y.astype(jnp.float32)
    r = jnp.where(
        lane % dh < half,
        jnp.roll(yf, -half, axis=-1),
        jnp.roll(yf, half, axis=-1),
    )
    return (yf * c + r * s).astype(y.dtype)


def rope_matrix(positions: jax.Array, inv_freq: jax.Array, d: int):
    """Rotation as a matrix: R[p] with x_rot = x @ R (split-half
    convention), built ONCE per decode step.

    Why: the elementwise rotate-half costs ~44 us/layer on v5e decode —
    the 64-lane slices + concat between the fused QKV matmul and the
    cache/attention ops lower to a chain of unfused Mosaic relayout
    kernels (measured: removing rope saved 1.4 ms/token on Llama-3-8B,
    15% of the step). As a [D, D] dot the rotation rides the MXU and
    fuses with the surrounding matmuls: R = I*cosf + J*sinf where I is
    the identity, J the constant rotate-half permutation-with-sign, and
    cosf/sinf the per-position duplicated tables.

    positions: [B, T] -> returns R [B, T, D, D] f32.
    """
    cos, sin = rope_tables(positions, inv_freq)  # [B, T, 1, D/2]
    cosf = jnp.concatenate([cos, cos], -1)[..., 0, :]  # [B, T, D]
    sinf = jnp.concatenate([sin, sin], -1)[..., 0, :]
    d2 = d // 2
    eye = jnp.eye(d, dtype=jnp.float32)
    # J[k, j]: -1 when k == j + d2 (j < d2), +1 when k == j - d2
    j_mat = (
        -jnp.eye(d, d, k=d2, dtype=jnp.float32).T
        + jnp.eye(d, d, k=d2, dtype=jnp.float32)
    )
    return (
        eye[None, None] * cosf[..., None, :]
        + j_mat[None, None] * sinf[..., None, :]
    )


def apply_rope_matrix(x: jax.Array, rot: jax.Array) -> jax.Array:
    """x: [B, T, H, D] @ rot [B, T, D, D] -> rotated x (exact f32 math,
    same result as apply_rope_tables)."""
    out = jnp.einsum(
        "bthd,btdk->bthk",
        x.astype(jnp.float32),
        rot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(x.dtype)
