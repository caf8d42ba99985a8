"""Decode hot-path profiler: per-matmul achieved HBM bandwidth + step
breakdown on the real chip.

Usage:  python benchmarks/prof_decode.py [--model 1b|8b] [--bits 4]

Measures, for each decode-shaped quantized matmul in the model, the achieved
fraction of HBM bandwidth (the decode step is bandwidth-bound: every weight
byte must stream HBM->VMEM once per token), then times the full decode chunk
to attribute the residual to attention / norms / sampling / scan overhead.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

HBM_GBPS = 819.0  # v5e


def bench(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _sync(r):
    """Force completion by FETCHING a value. block_until_ready does NOT
    synchronize over the axon dispatch tunnel — timings bracketed by it can
    read 30 TB/s; only a host transfer of the result is a real barrier."""
    import numpy as np

    return float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])


def bench_op(fn, x, *consts, iters_lo=16, iters_hi=144, reps=3):
    """Time ``fn(x, *consts)`` amortized inside one jitted scan, using
    DIFFERENTIAL timing: the axon dispatch tunnel costs ~20-25 ms per
    host fetch, so any single measurement is fetch + iters*op. We run the
    same scan at two lengths and take the slope — the fixed round-trip
    cancels exactly. ``consts`` MUST be jit arguments — closing over device
    arrays embeds them as HLO constants (slow compile; the tunnel rejects
    >100MB programs with HTTP 413)."""

    def make(iters):
        @jax.jit
        def loop(x, *consts):
            def body(c, _):
                y = fn(c, *consts)
                # nonlinear reduction of the FULL output as feedback: keeps
                # the loop serial and blocks slice-sinking / sum-through-dot
                # rewrites that would let XLA compute one output column
                fb = (y * y).sum(-1, keepdims=True).astype(c.dtype)
                c2 = c * 0.999 + fb * jnp.asarray(1e-8, c.dtype)
                return c2, ()
            c, _ = jax.lax.scan(body, x, None, length=iters)
            return c
        return loop

    lo = make(iters_lo)
    _sync(lo(x, *consts))
    # calibrate: crude op estimate assuming ~20 ms fetch, then size the long
    # scan so its compute (~0.3 s) dwarfs ms-level fetch jitter
    t0 = time.perf_counter()
    _sync(lo(x, *consts))
    est = max((time.perf_counter() - t0 - 0.020) / iters_lo, 2e-6)
    iters_hi = iters_lo + int(min(max(0.3 / est, 512), 50_000))
    hi = make(iters_hi)
    _sync(hi(x, *consts))
    # (min(t_hi) - min(t_lo)) / delta: the per-run minima are stable floors,
    # while min-of-paired-differences picks the most jitter-distorted pair
    # (it can even go negative / read above HBM peak)
    t_los, t_his = [], []
    for _ in range(reps + 2):
        t0 = time.perf_counter()
        _sync(lo(x, *consts))
        t_los.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _sync(hi(x, *consts))
        t_his.append(time.perf_counter() - t0)
    return (min(t_his) - min(t_los)) / (iters_hi - iters_lo)


def qt_bytes(qt):
    return (
        qt.packed.size * 4
        + qt.scales.size * qt.scales.dtype.itemsize
        + qt.biases.size * qt.biases.dtype.itemsize
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="1b", choices=["1b", "8b"])
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--group", type=int, default=64)
    ap.add_argument("--m", type=int, default=1, help="batch rows (decode=1)")
    ap.add_argument("--matmul-only", action="store_true")
    ap.add_argument("--e2e-only", action="store_true")
    args = ap.parse_args()

    from pie_tpu.ops.quant import quantize
    from pie_tpu.ops.quant_matmul_pallas import quant_matmul_pallas

    if args.model == "1b":
        d, di, hq, hkv, dh, V, L = 2048, 8192, 32, 8, 64, 128256, 16
    else:  # llama-3-8b
        d, di, hq, hkv, dh, V, L = 4096, 14336, 32, 8, 128, 128256, 32

    shapes = {
        "wqkv": (d, (hq + 2 * hkv) * dh),
        "wo": (hq * dh, d),
        "wgu": (d, 2 * di),
        "wd": (di, d),
        "lm_head": (d, V),
    }

    key = jax.random.PRNGKey(0)
    m = args.m
    if args.e2e_only:
        shapes = {}
    total_layer_bytes = 0
    total_layer_ms = 0.0
    print(f"model={args.model} bits={args.bits} g={args.group} M={m}")
    print(f"{'name':>8} {'K':>6} {'N':>7} {'MB':>7} {'us':>8} {'GB/s':>7} {'frac':>6}")
    rows = {}
    for name, (K, N) in shapes.items():
        w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
        qt = quantize(w, args.group, args.bits)
        qt = jax.tree.map(jax.device_put, qt)
        x = jnp.ones((m, qt.padded_k), jnp.bfloat16)
        dt = bench_op(quant_matmul_pallas, x, qt)
        nbytes = qt_bytes(qt)
        gbs = nbytes / dt / 1e9
        frac = gbs / HBM_GBPS
        rows[name] = (dt, nbytes)
        mult = L if name != "lm_head" else 1
        total_layer_bytes += nbytes * mult
        total_layer_ms += dt * 1e3 * mult
        print(
            f"{name:>8} {K:>6} {N:>7} {nbytes/1e6:>7.1f} {dt*1e6:>8.1f}"
            f" {gbs:>7.1f} {frac:>6.3f}"
        )

    if shapes:
        ideal_ms = total_layer_bytes / HBM_GBPS / 1e6
        print(
            f"\nmatmul total/token: {total_layer_ms:.3f} ms"
            f" (ideal {ideal_ms:.3f} ms, {total_layer_bytes/1e6:.0f} MB)"
        )
    if args.matmul_only:
        return

    # ---- full decode step -------------------------------------------------
    from pie_tpu.models.llama import LlamaConfig, LlamaModel
    from pie_tpu.engine.core import EngineCore, PenaltyParams
    from pie_tpu.ops.sampling import SamplingParams

    if args.model == "1b":
        cfg = LlamaConfig(
            hidden_size=d, intermediate_size=di, num_hidden_layers=L,
            num_attention_heads=hq, num_key_value_heads=hkv, head_dim=dh,
            vocab_size=V, tie_word_embeddings=True,
        )
    else:
        cfg = LlamaConfig(
            hidden_size=d, intermediate_size=di, num_hidden_layers=L,
            num_attention_heads=hq, num_key_value_heads=hkv, head_dim=dh,
            vocab_size=V, tie_word_embeddings=False,
        )
    model = LlamaModel(cfg)
    # build quantized weights directly — a bf16 8B pass would not fit HBM
    params = model.init_quantized_params(
        jax.random.PRNGKey(0), args.group, args.bits
    )

    core = EngineCore(model, params, batch_size=1, max_seq_len=512)
    state = core.new_state()
    sampling = SamplingParams.make(1, temperature=0.0)
    penalties = PenaltyParams.make(1)
    bias_ids = jnp.full((1, 1), -1, jnp.int32)
    bias_vals = jnp.zeros((1, 1), jnp.float32)
    stop_ids = jnp.full((4,), -1, jnp.int32)

    import numpy as np

    ids = jnp.arange(1, 65, dtype=jnp.int32)[None, :]
    state, tok, _ = core._prefill(
        params, state, ids, jnp.array([64]), jnp.array([0]), sampling,
        penalties, bias_ids, bias_vals,
    )

    CH = 64
    def run_chunk(state):
        st, outs = core._decode(
            params, state, sampling, penalties, bias_ids, bias_vals,
            stop_ids, num_steps=CH,
        )
        return st, outs

    # warmup/compile (state is donated: rebuild)
    st, _ = run_chunk(state)
    st, _ = run_chunk(st)
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        st, outs = run_chunk(st)
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (n * CH)
    print(f"decode step e2e: {dt*1e3:.3f} ms/tok = {1/dt:.1f} tok/s")
    print(f"  matmul share: {total_layer_ms/ (dt*1e3) :.2%}")
    print(f"  non-matmul residual: {dt*1e3 - total_layer_ms:.3f} ms/tok")


if __name__ == "__main__":
    main()
