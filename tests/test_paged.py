"""Paged KV pool + paged attention tests: manager bookkeeping, pool
write/gather round-trip, XLA paged attention vs dense SDPA, Pallas kernel
(interpret) vs XLA reference, INT8 pages."""

from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pie_tpu.cache.paged import (
    PAGE_SIZE,
    PagedCacheManager,
    PagedKVPool,
    gather_kv,
    write_tokens,
)
from pie_tpu.ops.attention import sdpa, attention_mask
from pie_tpu.ops.paged_attention import (
    paged_attention_decode,
    paged_attention_xla,
)


def test_manager_alloc_extend_free():
    m = PagedCacheManager(num_pages=8, max_pages_per_seq=4)
    assert m.allocate_seq(1, 100)  # 2 pages
    assert len(m.block_table(1)) == 2
    assert m.extend_seq(1, 130)  # 3 pages
    assert len(m.block_table(1)) == 3
    assert m.extend_seq(1, 140)  # still 3 pages, no-op
    assert len(m.block_table(1)) == 3
    m.free_seq(1)
    assert m.num_free_pages() == 8


def test_manager_max_pages_cap():
    m = PagedCacheManager(num_pages=8, max_pages_per_seq=4)
    with pytest.raises(ValueError):
        m.allocate_seq(1, 5 * PAGE_SIZE)


def test_manager_exhaustion_and_fork():
    m = PagedCacheManager(num_pages=4, max_pages_per_seq=4)
    assert m.allocate_seq(1, 3 * PAGE_SIZE)
    assert not m.allocate_seq(2, 2 * PAGE_SIZE)  # only 1 free
    # prefix fork shares pages with refcounts
    m.fork_seq(1, 3, 2 * PAGE_SIZE)
    assert m.block_table(3) == m.block_table(1)[:2]
    m.free_seq(1)
    assert m.num_free_pages() == 2  # 2 pages still held by seq 3
    m.free_seq(3)
    assert m.num_free_pages() == 4


def _setup_pool(b=2, lens=(70, 130), hkv=2, hq=4, d=16, quantized=False,
                seed=0, layers=1):
    rng = np.random.default_rng(seed)
    max_pages = 4
    num_pages = 16
    pool = PagedKVPool.create(layers, num_pages, hkv, d, jnp.float32,
                              quantized)
    man = PagedCacheManager(num_pages, max_pages)
    bt = np.full((b, max_pages), -1, np.int32)
    ks, vs = [], []
    for i, n in enumerate(lens):
        man.allocate_seq(i, n)
        table = man.block_table(i)
        bt[i, : len(table)] = table
        ks.append(rng.standard_normal((n, hkv, d)).astype(np.float32))
        vs.append(rng.standard_normal((n, hkv, d)).astype(np.float32))
    bt = jnp.asarray(bt)
    # write each sequence's tokens through write_tokens in chunks
    # (layer li gets the data scaled by li+1 so wrong-layer reads differ)
    for i, n in enumerate(lens):
        pos = jnp.asarray(np.arange(n)[None, :])
        for li in range(layers):
            pool = write_tokens(
                pool,
                jnp.asarray(ks[i][None]) * (li + 1),
                jnp.asarray(vs[i][None]) * (li + 1),
                li,
                bt[i : i + 1],
                pos,
            )
    return pool, bt, ks, vs, jnp.asarray(np.array(lens, np.int32))


def test_write_gather_roundtrip():
    pool, bt, ks, vs, lens = _setup_pool()
    k, v = gather_kv(pool, 0, bt, jnp.float32)
    for i, n in enumerate([70, 130]):
        np.testing.assert_allclose(np.asarray(k[i, :n]), ks[i], atol=1e-6)
        np.testing.assert_allclose(np.asarray(v[i, :n]), vs[i], atol=1e-6)


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_attention_xla_vs_dense(quantized):
    b, hkv, hq, d = 2, 2, 4, 16
    lens = (70, 130)
    pool, bt, ks, vs, lens_arr = _setup_pool(
        b, lens, hkv, hq, d, quantized=quantized
    )
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, hq, d)).astype(np.float32))
    scale = d**-0.5
    out = paged_attention_xla(
        q, pool.k[0], pool.v[0], bt, lens_arr, scale,
        pool.k_scale[0] if quantized else None,
        pool.v_scale[0] if quantized else None,
    )
    # dense reference: pad each seq's kv into [B, S, H, D]
    s = max(lens)
    kd = np.zeros((b, s, hkv, d), np.float32)
    vd = np.zeros((b, s, hkv, d), np.float32)
    for i, n in enumerate(lens):
        kd[i, :n] = ks[i]
        vd[i, :n] = vs[i]
    qpos = jnp.asarray([[lens[0] - 1], [lens[1] - 1]], jnp.int32)
    kv_pos = np.full((b, s), -1, np.int32)
    for i, n in enumerate(lens):
        kv_pos[i, :n] = np.arange(n)
    mask = attention_mask(qpos, jnp.asarray(kv_pos))
    ref = sdpa(
        q[:, None], jnp.asarray(kd), jnp.asarray(vd), mask, scale
    )[:, 0]
    tol = 0.05 if quantized else 2e-5
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=tol, rtol=tol)


@pytest.mark.parametrize("quantized", [False, True])
def test_pallas_decode_kernel_matches_xla(quantized):
    b, hkv, hq, d = 2, 2, 4, 16
    pool, bt, ks, vs, lens_arr = _setup_pool(
        b, (70, 130), hkv, hq, d, quantized=quantized
    )
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((b, hq, d)).astype(np.float32))
    scale = d**-0.5
    ref = paged_attention_xla(
        q, pool.k[0], pool.v[0], bt, lens_arr, scale,
        pool.k_scale[0] if quantized else None,
        pool.v_scale[0] if quantized else None,
    )
    out = paged_attention_decode(
        q, pool.k[0], pool.v[0], pool.k_scale[0], pool.v_scale[0],
        bt, lens_arr, scale, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3
    )


def test_pallas_decode_kernel_on_tpu():
    """Compile + run the kernel on real TPU hardware (the round-1 failure
    mode: Mosaic lane-alignment at head_dim 64). Skipped unless a TPU is
    attached and PIE_TPU_TESTS=1; runs scripts/tpu_kernel_check.py in a
    clean subprocess so this suite's forced-CPU conftest doesn't apply."""
    import os
    import subprocess
    import sys

    if not os.environ.get("PIE_TPU_TESTS"):
        pytest.skip("PIE_TPU_TESTS not set")
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    proc = subprocess.run(
        [sys.executable,
         str(Path(__file__).resolve().parent.parent
             / "scripts" / "tpu_kernel_check.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


@pytest.mark.parametrize("quantized", [False, True])
def test_pallas_decode_kernel_stacked_matches_xla(quantized):
    """Layer-stacked kernel (layer id applied inside the page DMAs) ==
    per-layer XLA reference on every layer."""
    from pie_tpu.ops.paged_attention import paged_attention_decode_stacked

    b, hkv, hq, d = 2, 2, 4, 16
    pool, bt, ks, vs, lens_arr = _setup_pool(
        b, (70, 130), hkv, hq, d, quantized=quantized, layers=2
    )
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, hq, d)).astype(np.float32))
    scale = d**-0.5
    for layer in range(2):
        ref = paged_attention_xla(
            q, pool.k[layer], pool.v[layer], bt, lens_arr, scale,
            pool.k_scale[layer] if quantized else None,
            pool.v_scale[layer] if quantized else None,
        )
        out = paged_attention_decode_stacked(
            q, pool.k, pool.v, pool.k_scale, pool.v_scale,
            jnp.int32(layer), bt, lens_arr, scale, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3
        )


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("window", [64, 100, 1 << 20])
def test_pallas_decode_kernel_window(quantized, window):
    """Sliding-window decode (gemma-3 layers, reference
    models/gemma/language.py:219-236): the kernel starts its page walk at
    the window's first page and masks the partial page; a huge window
    degrades to full attention."""
    b, hkv, hq, d = 2, 2, 4, 16
    pool, bt, ks, vs, lens_arr = _setup_pool(
        b, (70, 130), hkv, hq, d, quantized=quantized
    )
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, hq, d)).astype(np.float32))
    scale = d**-0.5
    ref = paged_attention_xla(
        q, pool.k[0], pool.v[0], bt, lens_arr, scale,
        pool.k_scale[0] if quantized else None,
        pool.v_scale[0] if quantized else None,
        window=window,
    )
    out = paged_attention_decode(
        q, pool.k[0], pool.v[0], pool.k_scale[0], pool.v_scale[0],
        bt, lens_arr, scale, window=jnp.int32(window), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3
    )
    # traced window == 0 must equal full attention
    full_ref = paged_attention_xla(
        q, pool.k[0], pool.v[0], bt, lens_arr, scale,
        pool.k_scale[0] if quantized else None,
        pool.v_scale[0] if quantized else None,
    )
    full = paged_attention_decode(
        q, pool.k[0], pool.v[0], pool.k_scale[0], pool.v_scale[0],
        bt, lens_arr, scale, window=jnp.int32(0), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(full_ref), atol=2e-3, rtol=2e-3
    )
