"""Quantization round-trip and fused matmul parity tests.

Mirrors the reference's quantization contract (group-wise affine, packed
uint32, scales+biases — reference cache/kv_cache/quantized.py:59-105) on the
TPU-native KN layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pie_tpu.ops import quant
from pie_tpu.ops.quant import (
    QuantizedTensor,
    dequantize,
    quantize,
    quantized_matmul,
)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("group_size", [32, 64, 128])
def test_roundtrip_error_bound(bits, group_size):
    k, n = 512, 256
    w = jax.random.normal(jax.random.PRNGKey(0), (k, n), jnp.float32)
    qt = quantize(w, group_size=group_size, bits=bits)
    w2 = dequantize(qt, dtype=jnp.float32)
    assert w2.shape == (k, n)
    # max error bounded by half an LSB of the worst group range
    grp = w.reshape(k // group_size, group_size, n)
    step = (grp.max(1) - grp.min(1)) / (2**bits - 1)
    err = jnp.abs(w - w2).reshape(k // group_size, group_size, n)
    assert jnp.all(err <= jnp.repeat(step[:, None, :], group_size, 1) * 0.51)


def test_pack_unpack_identity():
    rng = np.random.default_rng(0)
    for bits in (4, 8):
        q = jnp.asarray(
            rng.integers(0, 2**bits, size=(1024, 128)), dtype=jnp.int32
        )
        packed = quant.pack_codes(q, bits)
        assert packed.dtype == jnp.uint32
        assert packed.shape == (1024 // (32 // bits), 128)
        q2 = quant.unpack_codes(packed, bits)
        np.testing.assert_array_equal(np.asarray(q), np.asarray(q2))


def test_degenerate_group_exact():
    w = jnp.ones((512, 128), jnp.float32) * 3.25
    qt = quantize(w, 64, 4)
    w2 = dequantize(qt, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(w2), 3.25, rtol=0, atol=1e-6)


def test_k_padding():
    # K not a multiple of PACK_TILE_K gets zero-padded transparently
    k, n = 320, 128
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
    qt = quantize(w, 64, 4)
    assert qt.shape == (k, n)
    assert qt.padded_k == 512
    w2 = dequantize(qt, dtype=jnp.float32)
    assert w2.shape == (k, n)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, k), jnp.float32)
    y = np.asarray(quantized_matmul(x, qt, impl="xla"))
    y_ref = np.asarray(x @ dequantize(qt, jnp.float32))
    # xla impl dequantizes to bf16; use a magnitude-normalized bound
    rel = np.abs(y - y_ref).max() / np.abs(y_ref).max()
    assert rel < 0.02, rel


def test_mlx_layout_conversion():
    n, k = 96, 512
    w_nk = jax.random.normal(jax.random.PRNGKey(3), (n, k), jnp.float32)
    packed, scales, biases = quant.quantize_mlx_layout(w_nk, 64, 4)
    assert packed.shape == (n, k // 8)
    qt = quant.from_mlx_layout(packed, scales, biases, 64, 4)
    w_kn = dequantize(qt, jnp.float32)
    qt_direct = quantize(w_nk.T, 64, 4)
    w_direct = dequantize(qt_direct, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(w_kn), np.asarray(w_direct), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("bits,group_size", [(4, 64), (8, 64), (4, 32), (4, 128)])
def test_pallas_kernel_matches_xla(bits, group_size):
    """Kernel logic validated in interpreter mode on CPU (compiled path is
    exercised on real TPU by bench.py / engine tests)."""
    from pie_tpu.ops.quant_matmul_pallas import quant_matmul_pallas

    k, n, m = 1024, 256, 16
    w = jax.random.normal(jax.random.PRNGKey(4), (k, n), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(5), (m, k), jnp.float32)
    qt = quantize(w, group_size=group_size, bits=bits)
    y_ref = np.asarray(x @ dequantize(qt, jnp.float32))
    y = np.asarray(quant_matmul_pallas(x, qt, interpret=True))
    # kernel dequantizes to bf16 before the MXU dot; its per-weight bf16
    # product rounding is <= 2^-9 * 32 * scale ~ 6% of one quantization LSB
    # (vs the ~29% LSB/sqrt(12) noise of the quantization itself), which
    # accumulates to at most a few percent of the output magnitude here
    rel = np.abs(y - y_ref).max() / np.abs(y_ref).max()
    assert rel < 0.025, f"normalized max err {rel}"


def test_quantized_tensor_is_pytree():
    w = jax.random.normal(jax.random.PRNGKey(6), (512, 128), jnp.float32)
    qt = quantize(w, 64, 4)
    leaves, treedef = jax.tree_util.tree_flatten(qt)
    assert len(leaves) == 3
    qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert qt2.bits == 4 and qt2.group_size == 64 and qt2.shape == (512, 128)

    @jax.jit
    def f(x, q):
        return quantized_matmul(x, q, impl="xla")

    x = jnp.ones((2, 512), jnp.float32)
    y = f(x, qt)
    assert y.shape == (2, 128)


def test_stacked_kernel_matches_per_layer():
    """quant_matmul_stacked indexes stacked [L, ...] weights by a scalar
    layer id inside the kernel (interpret mode)."""
    from pie_tpu.ops.quant_matmul_pallas import (
        quant_matmul_pallas,
        quant_matmul_stacked,
    )

    k, n, m, L = 512, 256, 8, 3
    ws = jax.random.normal(jax.random.PRNGKey(7), (L, k, n), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(8), (m, k), jnp.float32)
    qts = [quantize(ws[i], 64, 4) for i in range(L)]
    stacked = QuantizedTensor(
        packed=jnp.stack([q.packed for q in qts]),
        scales=jnp.stack([q.scales for q in qts]),
        biases=jnp.stack([q.biases for q in qts]),
        bits=4,
        group_size=64,
        shape=(k, n),
    )
    for i in range(L):
        y_one = np.asarray(quant_matmul_pallas(x, qts[i], interpret=True))
        y_st = np.asarray(
            quant_matmul_stacked(x, i, stacked, interpret=True)
        )
        np.testing.assert_allclose(y_st, y_one, rtol=0, atol=1e-4)


def test_sdpa_quantized_matches_dequantized_sdpa():
    """sdpa_quantized (no dequantized-cache materialization) == sdpa over
    the explicitly dequantized int8 KV, within bf16 dot tolerance."""
    import jax.numpy as jnp

    from pie_tpu.cache.kv_cache import dequantize_kv, quantize_kv
    from pie_tpu.ops.attention import attention_mask, sdpa, sdpa_quantized

    b, s, hq, hkv, d, tq = 2, 24, 4, 2, 16, 3
    key = jax.random.PRNGKey(0)
    kk, kv_, kq_ = jax.random.split(key, 3)
    q = jax.random.normal(kq_, (b, tq, hq, d), jnp.float32)
    k = jax.random.normal(kk, (b, s, hkv, d), jnp.float32)
    v = jax.random.normal(kv_, (b, s, hkv, d), jnp.float32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    qpos = jnp.array([[10, 11, 12]] * b)
    kvpos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    mask = attention_mask(qpos, kvpos)
    scale = d**-0.5
    out_q = sdpa_quantized(q, kq, ks, vq, vs, mask, scale)
    out_ref = sdpa(
        q, dequantize_kv(kq, ks, jnp.float32),
        dequantize_kv(vq, vs, jnp.float32), mask, scale,
    )
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(out_ref), rtol=0, atol=0.03
    )


@pytest.mark.parametrize("dh", [64, 128])
def test_rope_epilogue_kernel_matches_reference(dh):
    """Fused-QKV rope epilogue inside the Pallas kernel (interpret mode) ==
    plain matmul followed by apply_rope_cs; and apply_rope_cs itself ==
    split-head table rope with v columns untouched."""
    import jax.numpy as jnp

    from pie_tpu.ops.quant import quantize
    from pie_tpu.ops.quant_matmul_pallas import quant_matmul_stacked
    from pie_tpu.ops.rope import (
        apply_rope_cs,
        apply_rope_tables,
        make_inv_freq,
        rope_qkv_cs,
        rope_tables,
    )

    hq, hkv = 8, 2
    k_dim, n = 512, (hq + 2 * hkv) * dh
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (2, k_dim, n), jnp.float32) * 0.02
    qt = jax.vmap(lambda m: quantize(m, 64, 4))(w)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, k_dim), jnp.bfloat16)
    pos = jnp.array([42], jnp.int32)
    inv = jnp.asarray(make_inv_freq(dh, 500000.0))
    cs = rope_qkv_cs(pos, inv, hq, hkv, dh)

    base = quant_matmul_stacked(x, jnp.int32(1), qt, interpret=True)
    ref = apply_rope_cs(base, cs[0], cs[1], dh)
    out = quant_matmul_stacked(
        x, jnp.int32(1), qt, rope_cs=cs, rope_dim=dh, interpret=True
    )
    scale = float(jnp.abs(ref.astype(jnp.float32)).max())
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=0.02 * scale,
    )

    # apply_rope_cs == table rope on the q/k groups, identity on v
    y = jax.random.normal(key, (3, n), jnp.float32)
    pos3 = jnp.array([5, 17, 123], jnp.int32)
    c3, s3 = rope_qkv_cs(pos3, inv, hq, hkv, dh)
    got = apply_rope_cs(y, c3, s3, dh)
    nq, nk = hq * dh, hkv * dh
    cos, sin = rope_tables(pos3[:, None], inv)
    qr = apply_rope_tables(
        y[:, :nq].reshape(3, 1, hq, dh), cos, sin
    ).reshape(3, nq)
    kr = apply_rope_tables(
        y[:, nq:nq + nk].reshape(3, 1, hkv, dh), cos, sin
    ).reshape(3, nk)
    want = jnp.concatenate([qr, kr, y[:, nq + nk:]], -1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=1e-5
    )


def test_ln_prologue_kernel_matches_reference():
    """Fused rms-norm prologue (quant_matmul_stacked ln_w, interpret mode)
    == rms_norm then matmul (the per-layer ln1 fold, models/llama.py
    layer_fn decode path)."""
    from pie_tpu.ops.quant_matmul_pallas import (
        quant_matmul_pallas,
        quant_matmul_stacked,
    )

    k, n, m, L = 512, 256, 8, 2
    eps = 1e-5
    ws = jax.random.normal(jax.random.PRNGKey(11), (L, k, n), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(12), (m, k), jnp.float32)
    lnw = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(13), (L, k),
                                        jnp.float32)
    qts = [quantize(ws[i], 64, 4) for i in range(L)]
    stacked = QuantizedTensor(
        packed=jnp.stack([q.packed for q in qts]),
        scales=jnp.stack([q.scales for q in qts]),
        biases=jnp.stack([q.biases for q in qts]),
        bits=4,
        group_size=64,
        shape=(k, n),
    )

    def ref_norm(xv, w):
        xf = xv.astype(jnp.float32)
        inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
        return (xf * inv * w).astype(xv.dtype)

    for i in range(L):
        want = np.asarray(
            quant_matmul_pallas(ref_norm(x, lnw[i]), qts[i], interpret=True)
        )
        got = np.asarray(
            quant_matmul_stacked(
                x, i, stacked, ln_w=lnw, ln_eps=eps, interpret=True
            )
        )
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)
    # unstacked variant (final-norm -> lm_head fold)
    want = np.asarray(
        quant_matmul_pallas(ref_norm(x, lnw[0]), qts[0], interpret=True)
    )
    got = np.asarray(
        quant_matmul_pallas(
            x, qts[0], ln_w=lnw[0], ln_eps=eps, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)
