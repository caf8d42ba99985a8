"""Headline benchmark (charter targets, BASELINE.md):

- Llama-3-8B INT4(g=64) batch-1 decode tokens/sec on one chip — the
  north-star metric (>= 90% of the HBM roofline).
- Llama-3.2-1B INT4(g=64) decode (charter config #1, round-1 continuity).
- p50 TTFT for the 8B geometry (512-token prompt).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N, "extra": {...}}
vs_baseline = fraction of the per-chip HBM roofline (bytes-per-token model:
every quantized weight byte streams HBM->VMEM once per decoded token).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

HBM_GBPS = {"v5e": 819.0, "v5litepod": 819.0, "v4": 1228.0, "v5p": 2765.0}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def llama32_1b_config():
    from pie_tpu.models.llama import LlamaConfig

    return LlamaConfig(
        model_type="llama",
        hidden_size=2048,
        intermediate_size=8192,
        num_hidden_layers=16,
        num_attention_heads=32,
        num_key_value_heads=8,
        head_dim=64,
        vocab_size=128256,
        rope_theta=500000.0,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 32.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        },
        tie_word_embeddings=True,
    )


def llama3_8b_config():
    from pie_tpu.models.llama import LlamaConfig

    return LlamaConfig(
        model_type="llama",
        hidden_size=4096,
        intermediate_size=14336,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=8,
        head_dim=128,
        vocab_size=128256,
        rope_theta=500000.0,
        tie_word_embeddings=False,
    )


def quantized_bytes(params) -> int:
    """HBM bytes streamed per decoded token (weights + scales/biases; the
    bf16 embed table is only gathered one row per token, negligible)."""
    from pie_tpu.ops.quant import QuantizedTensor

    total = 0
    for leaf in jax.tree_util.tree_leaves(
        params, is_leaf=lambda x: isinstance(x, QuantizedTensor)
    ):
        if isinstance(leaf, QuantizedTensor):
            total += leaf.packed.size * 4
            total += leaf.scales.size * leaf.scales.dtype.itemsize
            total += leaf.biases.size * leaf.biases.dtype.itemsize
    return total


def bench_decode(engine, prompt, steps, chunk):
    """Best-of-3 steady-state decode tokens/sec.

    Timed from the FIRST streamed token (prefill + compile excluded —
    prefill latency is the separate TTFT metric), so the number measures
    the decode loop itself: chunked device steps + per-chunk host drains."""
    # warmup twice: first call compiles prefill + the decode-chunk ladder,
    # second absorbs post-compile cache effects
    engine.generate(prompt, max_completion_tokens=steps, temperature=0.0)
    engine.generate(prompt, max_completion_tokens=chunk + 1, temperature=0.0)
    best = 0.0
    for _ in range(3):
        gen = engine.generate_stream(
            prompt, max_completion_tokens=steps, temperature=0.0
        )
        next(gen)  # prefill + first token: untimed (TTFT covers it)
        n = 0
        t0 = time.perf_counter()
        try:
            while True:
                next(gen)
                n += 1
        except StopIteration:
            pass
        dt = time.perf_counter() - t0
        best = max(best, n / dt)
    return best


def bench_ttft(engine, prompt_len, n=7):
    """p50 time-to-first-token for a prompt of ``prompt_len`` tokens."""
    prompt = list(range(1, prompt_len + 1))
    # compile the prefill bucket
    engine.generate(prompt, max_completion_tokens=1, temperature=0.0)
    times = []
    for _ in range(n):
        gen = engine.generate_stream(
            prompt, max_completion_tokens=2, temperature=0.0
        )
        t0 = time.perf_counter()
        next(gen)  # first token
        times.append(time.perf_counter() - t0)
        for _ in gen:
            pass
    times.sort()
    return times[len(times) // 2]


def run_geometry(config, steps, chunk, max_seq_len, ttft_prompt=None):
    from pie_tpu.engine import InferenceEngine
    from pie_tpu.models.llama import LlamaModel

    model = LlamaModel(config)
    log(f"bench: init quantized params ({config.num_hidden_layers} layers)")
    params = model.init_quantized_params(jax.random.PRNGKey(0), 64, 4)
    wbytes = quantized_bytes(params)
    engine = InferenceEngine(
        model=model, params=params, max_seq_len=max_seq_len,
        decode_chunk=chunk,
    )
    log("bench: warmup/compile + timing decode")
    prompt = list(range(1, 65))
    tok_s = bench_decode(engine, prompt, steps, chunk)
    ttft = None
    if ttft_prompt:
        log("bench: TTFT")
        ttft = bench_ttft(engine, ttft_prompt)
    del engine, params
    return tok_s, wbytes, ttft


def bench_paged(config, lanes=8, prompt_len=64, new_tokens=128):
    """Charter config #3: INT8 paged KV + continuous batching on one chip.

    Measures (a) aggregate decode tok/s with ``lanes`` concurrent sequences
    via the Scheduler's chunked mixed program, and (b) TTFT of a 512-token
    prompt admitted while 7 lanes are decode-busy (the prefill-rider
    scenario mixed_forward exists for, ref include/engine/
    batch_details.hpp:10-88).
    """
    import time as _t

    from pie_tpu.engine.scheduler import PagedEngine, Scheduler
    from pie_tpu.models.llama import LlamaModel

    model = LlamaModel(config)
    log(f"bench[paged]: init quantized params ({config.num_hidden_layers} layers)")
    params = model.init_quantized_params(jax.random.PRNGKey(0), 64, 4)
    engine = PagedEngine(
        model, params, num_lanes=lanes, num_pages=112, max_pages_per_seq=12,
        kv_quantized=True,
    )
    sched = Scheduler(engine, decode_steps=8)
    prompt = list(range(1, prompt_len + 1))

    log("bench[paged]: warmup/compile (prefill + mixed chunk programs)")
    sched.add_request(prompt, max_new_tokens=17, temperature=0.0)
    sched.run_to_completion()

    # (a) aggregate decode throughput at `lanes` lanes
    log(f"bench[paged]: timing {lanes}-lane aggregate decode")
    best = 0.0
    for _ in range(2):
        seqs = [
            sched.add_request(prompt, max_new_tokens=new_tokens,
                              temperature=0.0)
            for _ in range(lanes)
        ]
        t0 = _t.perf_counter()
        sched.run_to_completion()
        dt = _t.perf_counter() - t0
        total = sum(len(s.output_ids) for s in seqs)
        best = max(best, total / dt)

    # (b) TTFT of a 512-token prompt admitted while 7 lanes decode.
    # DISTINCT prompts per trial: identical prompts would hit the
    # PrefixStore and skip prefill entirely — that case is measured
    # separately as ttft_cached below.
    log("bench[paged]: TTFT under decode load")
    busy = [
        sched.add_request(prompt, max_new_tokens=400, temperature=0.0)
        for _ in range(lanes - 1)
    ]
    while any(not s.output_ids for s in busy):
        sched.step()
    # untimed warmup admission: compiles the rider-chunk shape a 512-token
    # prompt needs (chunk programs compile per distinct step count)
    warm = sched.add_request(
        list(range(1, 513)), max_new_tokens=8, temperature=0.0
    )
    while warm.finish_reason is None:
        sched.step()

    def fresh_prompt(salt):
        return [1 + (i * 37 + salt * 101) % 100000 for i in range(512)]

    def ttft_of(req_prompt):
        t0 = _t.perf_counter()
        late = sched.add_request(
            req_prompt, max_new_tokens=8, temperature=0.0
        )
        while not late.output_ids:
            sched.step()
        dt = _t.perf_counter() - t0
        while late.finish_reason is None:
            sched.step()
        return dt

    ttfts = sorted(ttft_of(fresh_prompt(s)) for s in range(3))

    # (c) prefix-cache hit: the SAME 512-token prompt again — full pages
    # splice from the PrefixStore and only the tail token prefills
    cached_prompt = fresh_prompt(99)
    ttft_of(cached_prompt)  # populate the store
    ttfts_cached = sorted(ttft_of(cached_prompt) for _ in range(3))

    for s in busy:
        s.cancelled = True
    sched.run_to_completion()
    import gc

    del sched, engine, params  # free HBM before the long-ctx geometry
    gc.collect()
    return (
        best, ttfts[len(ttfts) // 2], ttfts_cached[len(ttfts_cached) // 2]
    )


def bench_paged_longctx(config, lanes=8, ctx=2048, new_tokens=128):
    """Round-4 verdict weak #4: the paged path was only ever measured at
    ~192-token contexts. 8 lanes at ``ctx``-token contexts: per-step page
    walks cover ctx/64 pages per lane, exercising the paged-attention
    kernel's DMA pipeline at realistic depth."""
    import time as _t

    from pie_tpu.engine.scheduler import PagedEngine, Scheduler
    from pie_tpu.models.llama import LlamaModel

    model = LlamaModel(config)
    log(f"bench[paged-{ctx}]: init")
    params = model.init_quantized_params(jax.random.PRNGKey(0), 64, 4)
    pages_per_seq = ctx // 64 + 2
    engine = PagedEngine(
        model, params, num_lanes=lanes,
        num_pages=lanes * pages_per_seq + 8,
        max_pages_per_seq=pages_per_seq, kv_quantized=True,
    )
    sched = Scheduler(engine, decode_steps=8, prefix_cache=False)
    plen = ctx - new_tokens

    def prompt(salt):
        return [1 + (i * 37 + salt * 101) % 100000 for i in range(plen)]

    log(f"bench[paged-{ctx}]: warmup/compile")
    w = sched.add_request(prompt(0), max_new_tokens=9, temperature=0.0)
    sched.run_to_completion()
    best = 0.0
    for rep in range(2):
        seqs = [
            sched.add_request(
                prompt(rep * lanes + i + 1), max_new_tokens=new_tokens,
                temperature=0.0,
            )
            for i in range(lanes)
        ]
        # admit + prefill all lanes first; time the decode-dominated drain
        while any(not s.output_ids for s in seqs):
            sched.step()
        done0 = sum(len(s.output_ids) for s in seqs)
        t0 = _t.perf_counter()
        sched.run_to_completion()
        dt = _t.perf_counter() - t0
        total = sum(len(s.output_ids) for s in seqs) - done0
        best = max(best, total / dt)
    import gc

    del sched, engine, params
    gc.collect()
    return best


def measure_hbm_gbps() -> float:
    """Device-timed sustained HBM read rate of THIS run's chip window.

    An XLA column-reduce over 2 GiB is a pure stream; nothing in the
    machine reads weights faster (benchmarks/hbm_peak.py: every access
    pattern tops out at ~747-757 GB/s vs the 819 spec, i.e. the practical
    ceiling is ~92% of spec and drifts with the shared-chip regime).
    Wall-clock through the dispatch tunnel is untrustworthy, so the time
    comes from a profiler trace's device lanes."""
    import glob
    import gzip
    import os
    import tempfile

    import numpy as np

    x = jax.block_until_ready(jnp.ones((262144, 2048), jnp.float32))
    red = jax.jit(lambda a: jnp.sum(a, axis=0))
    jax.block_until_ready(red(x))
    td = tempfile.mkdtemp(prefix="jaxtrace_")
    reps = 4
    with jax.profiler.trace(td):
        for _ in range(reps):
            jax.block_until_ready(red(x))
    total = {}
    for p in glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                       recursive=True):
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        events = data.get("traceEvents", [])
        # DEVICE lanes only: without this filter a long host span wins
        # the max and the number is garbage
        dev_pids = set()
        for ev in events:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                name = ev.get("args", {}).get("name", "")
                if "TPU" in name or "device" in name.lower():
                    dev_pids.add(ev.get("pid"))
        for ev in events:
            if ev.get("ph") != "X":
                continue
            if dev_pids and ev.get("pid") not in dev_pids:
                continue
            total[ev.get("name", "?")] = (
                total.get(ev.get("name", "?"), 0.0) + ev.get("dur", 0.0)
            )
    if not total:
        return 0.0
    us = max(total.values()) / reps
    del x
    return 262144 * 2048 * 4 / us / 1e3


def main():
    on_tpu = jax.default_backend() == "tpu"
    gbps = HBM_GBPS.get("v5e", 819.0)

    if not on_tpu:  # smoke-test geometry for CPU runs
        from pie_tpu.models.llama import LlamaConfig

        config = LlamaConfig(
            hidden_size=512, intermediate_size=1024, num_hidden_layers=2,
            num_attention_heads=8, num_key_value_heads=4, vocab_size=2048,
            tie_word_embeddings=True,
        )
        tok_s, wbytes, _ = run_geometry(config, 16, 8, 512)
        out = {
            "metric": "llama-smoke_int4g64_b1_decode",
            "value": round(tok_s, 2),
            "unit": "tok/s",
            "vs_baseline": round(tok_s / (gbps * 1e9 / wbytes), 4),
        }
        print(json.dumps(out))
        return

    # the chip window's actual sustained stream rate (~92% of the 819
    # spec, regime-dependent): reported alongside so vs_baseline (which
    # stays spec-based) can be read against what the silicon allowed
    hbm_meas = measure_hbm_gbps()
    log(f"bench: measured HBM stream {hbm_meas:.0f} GB/s "
        f"(spec {gbps:.0f})")

    # charter headline: Llama-3-8B INT4(g=64) decode + TTFT
    # chunk=128: the depth-3 lookahead hides the per-chunk fetch RT
    # fully at 128 steps (A/B'd: 64 -> 145.4, 128 -> 146.9 tok/s; deeper
    # lookahead and larger chunks measured flat)
    tok8, bytes8, ttft8 = run_geometry(
        llama3_8b_config(), steps=257, chunk=128, max_seq_len=1024,
        ttft_prompt=512,
    )
    roof8 = gbps * 1e9 / bytes8
    # config #1: Llama-3.2-1B
    tok1, bytes1, _ = run_geometry(
        llama32_1b_config(), steps=257, chunk=128, max_seq_len=512,
    )
    roof1 = gbps * 1e9 / bytes1
    # charter config #3: INT8 paged KV + continuous batching (8 lanes)
    paged_tok, ttft_load, ttft_cached = bench_paged(llama3_8b_config())
    # round-5: long-context paged serving (2k ctx per lane)
    paged2k_tok = bench_paged_longctx(llama3_8b_config())

    out = {
        "metric": "llama3-8b_int4g64_b1_decode",
        "value": round(tok8, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok8 / roof8, 4),
        "extra": {
            "8b_roofline_tok_s": round(roof8, 1),
            "8b_ttft_p50_ms": round(ttft8 * 1e3, 1) if ttft8 else None,
            "1b_tok_s": round(tok1, 2),
            "1b_vs_roofline": round(tok1 / roof1, 4),
            "weight_bytes_8b": bytes8,
            "weight_bytes_1b": bytes1,
            "8b_paged8_int8kv_tok_s": round(paged_tok, 2),
            "8b_ttft_under_load_p50_ms": round(ttft_load * 1e3, 1),
            "8b_ttft_under_load_cached_p50_ms": round(ttft_cached * 1e3, 1),
            "8b_paged8_ctx2k_tok_s": round(paged2k_tok, 2),
            "hbm_measured_gbps": round(hbm_meas, 1),
            "8b_vs_measured_hbm": (
                round(tok8 / (hbm_meas * 1e9 / bytes8), 4) if hbm_meas else None
            ),
            "1b_vs_measured_hbm": (
                round(tok1 / (hbm_meas * 1e9 / bytes1), 4) if hbm_meas else None
            ),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
