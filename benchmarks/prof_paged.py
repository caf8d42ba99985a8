"""Batched-decode (paged path) profiler: where does a decode-only chunk
step go at 8 lanes? (round-3 verdict weak #5: 243 tok/s aggregate = 1.9x
single-stream where near-lane-linear is expected).

Times, with the differential method from prof_decode (the axon fetch
round-trip cancels):
  - the full decode-only chunk program (Scheduler's use_rider=False path)
  - one paged_forward decode step (M = lanes)
  - the paged-attention decode kernel alone
  - the quantized matmul at M = lanes (weight stream — the floor)

Usage: python benchmarks/prof_paged.py [--model 8b] [--lanes 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from prof_decode import bench_op, qt_bytes  # noqa: E402  (benchmarks/ dir)

HBM_GBPS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="8b", choices=["1b", "8b"])
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--pages", type=int, default=112)
    ap.add_argument("--ctx", type=int, default=192)
    ap.add_argument("--steps", type=int, default=16)
    args = ap.parse_args()

    from pie_tpu.engine.scheduler import PagedEngine, Scheduler
    from pie_tpu.models.llama import LlamaConfig, LlamaModel

    if args.model == "1b":
        cfg = LlamaConfig(
            hidden_size=2048, intermediate_size=8192, num_hidden_layers=16,
            num_attention_heads=32, num_key_value_heads=8, head_dim=64,
            vocab_size=128256, tie_word_embeddings=True,
        )
    else:
        cfg = LlamaConfig(
            hidden_size=4096, intermediate_size=14336, num_hidden_layers=32,
            num_attention_heads=32, num_key_value_heads=8, head_dim=128,
            vocab_size=128256, tie_word_embeddings=False,
        )
    model = LlamaModel(cfg)
    params = model.init_quantized_params(jax.random.PRNGKey(0), 64, 4)
    b = args.lanes
    mpps = max(12, args.ctx // 64 + 3)
    pages = max(args.pages, b * mpps + 8)
    eng = PagedEngine(
        model, params, num_lanes=b, num_pages=pages,
        max_pages_per_seq=mpps, kv_quantized=True,
    )
    sched = Scheduler(eng, decode_steps=args.steps)
    prompt = list(range(1, 65))

    # stand up 8 decoding lanes through the real admission path.
    # max_new must FIT the per-seq page budget or admission errors out
    budget = mpps * 64 - len(prompt) - 8
    seqs = [
        sched.add_request(prompt, max_new_tokens=budget, temperature=0.0)
        for _ in range(b)
    ]
    for _ in range(200):
        if all(s.status.value == "decoding" for s in seqs):
            break
        if any(s.status.value in ("error", "completed") for s in seqs):
            raise RuntimeError(
                f"admission failed: {[s.finish_reason for s in seqs]}"
            )
        sched.step()
    while int(sched.context_lens.max()) < args.ctx:
        sched.step()
    print(f"lanes decoding, ctx={sched.context_lens.tolist()}", flush=True)

    # ---- full decode-only chunk program --------------------------------
    import pie_tpu.engine.scheduler as sched_mod

    n = args.steps
    plan = sched._plan_chunk(n)
    chunk_args = dict(
        last_tokens=jnp.asarray(sched.last_tokens),
        context_lens=jnp.asarray(sched.context_lens),
        block_tables=jnp.asarray(sched.block_tables),
        histories=jnp.asarray(sched.histories),
        done=jnp.asarray(sched.done),
        produced=jnp.asarray(sched.produced),
        max_new=jnp.asarray(sched.max_new),
        stop_ids=jnp.asarray(sched.stop_ids),
    )
    from pie_tpu.ops.sampling import SamplingParams

    sampling = SamplingParams(
        temperature=jnp.asarray(sched.samp["temperature"]),
        top_p=jnp.asarray(sched.samp["top_p"]),
        min_p=jnp.asarray(sched.samp["min_p"]),
        top_k=jnp.asarray(sched.samp["top_k"]),
    )
    zero = jnp.zeros
    wake = jnp.full((b,), -1, jnp.int32)

    def run_chunk(pool):
        emitted, pool, *_ = eng._chunk(
            eng.params, pool,
            chunk_args["last_tokens"], chunk_args["context_lens"],
            chunk_args["block_tables"], chunk_args["histories"],
            chunk_args["done"], chunk_args["produced"],
            chunk_args["max_new"], chunk_args["stop_ids"],
            sampling,
            sched._pen_params(),
            jnp.full((n, eng.rider_width), -1, jnp.int32),
            jnp.full((n, eng.rider_width), -1, jnp.int32),
            zero((n,), jnp.int32), zero((n,), jnp.int32),
            zero((n, 1, 1), jnp.float32), zero((n,), bool),
            jnp.full((n, 1, 1), -1, jnp.int32),  # pf_pos3
            zero((b,), jnp.int32),  # pos_delta
            wake, zero((b,), jnp.int32), zero((b,), jnp.int32),
            zero((b,), jnp.int32),  # wake_prod
            jnp.asarray(sched.histories),
            jnp.asarray(sched.bias_ids), jnp.asarray(sched.bias_vals),
            jnp.ones((1, 1), bool), zero((b,), bool),
            jnp.full((b,), n, jnp.int32),
            eng.key,
            num_steps=n, sampler_kind="greedy", use_mask=False,
            use_embeds=False, use_rider=False, use_bias=False,
        )
        return emitted, pool

    # warm + time manually (pool is donated; keep threading it)
    emitted, pool = run_chunk(eng.pool)
    emitted, pool = run_chunk(pool)
    np.asarray(emitted)
    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps):
        emitted, pool = run_chunk(pool)
    np.asarray(emitted)
    dt_chunk = (time.perf_counter() - t0) / reps
    per_tok = dt_chunk / n
    agg = b * n / dt_chunk
    print(
        f"decode-only chunk (n={n}, b={b}): {dt_chunk*1e3:.2f} ms"
        f" = {per_tok*1e3:.3f} ms/step -> {agg:.1f} tok/s aggregate",
        flush=True,
    )
    eng.pool = pool

    # ---- pieces --------------------------------------------------------
    lp = params["layers"]
    dh = cfg.resolved_head_dim

    # quantized matmul floor at M=b (per layer set)
    from pie_tpu.ops.quant_matmul_pallas import quant_matmul_stacked

    x = jnp.ones((b, cfg.hidden_size), jnp.bfloat16)
    dt = bench_op(
        lambda x, qt: quant_matmul_stacked(x, jnp.int32(1), qt), x, lp["wqkv"]
    )
    print(f"wqkv @ M={b}: {dt*1e6:.1f} us "
          f"({qt_bytes(lp['wqkv'])/cfg.num_hidden_layers/dt/1e9:.0f} GB/s)",
          flush=True)

    # paged attention decode kernel alone (stacked pool slice per layer)
    from pie_tpu.ops.paged_attention import paged_attention_decode

    pool_now = eng.pool
    q = jnp.ones((b, cfg.num_attention_heads, dh), jnp.bfloat16)
    bt = jnp.asarray(np.maximum(sched.block_tables, 0))
    ctx = jnp.asarray(sched.context_lens)

    def attn_once(q, k0, v0, ks0, vs0):
        return paged_attention_decode(q, k0, v0, ks0, vs0, bt, ctx, 0.088)

    dt = bench_op(
        attn_once, q, pool_now.k[1], pool_now.v[1],
        pool_now.k_scale[1], pool_now.v_scale[1],
    )
    print(f"paged-attn kernel (1 layer, b={b}): {dt*1e6:.1f} us", flush=True)

    # pool layer slice cost (the _dyn(apk, i) copies paged_forward pays);
    # float carry: bench_op scans fn(c, ...) with matching dtypes
    def slice_probe(c, k):
        i = jnp.int32(c[0]) % k.shape[0]
        s = jax.lax.dynamic_index_in_dim(k, i, 0, keepdims=False)
        return c + s.sum(dtype=jnp.float32) * jnp.float32(1e-30)

    dt = bench_op(slice_probe, jnp.ones((1,), jnp.float32), pool_now.k)
    print(f"pool k layer slice+reduce (1 layer): {dt*1e6:.1f} us", flush=True)

    for s in seqs:
        s.cancelled = True
    sched.run_to_completion()


if __name__ == "__main__":
    main()
