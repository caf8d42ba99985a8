"""Op-level decode profile via jax.profiler: runs decode chunks under a
trace and aggregates device-op durations from the perfetto JSON, printing
the top ops by total time. Ground truth for where a step goes —
differential timing (prof_decode) gives totals; this gives attribution.

Usage: python benchmarks/trace_decode.py [--model 8b] [--paged] [--fused 0|1]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _aggregate(trace_dir: str, steps: int):
    """Parse perfetto traces under trace_dir; return {op: total_us}."""
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    agg = defaultdict(float)
    count = defaultdict(int)
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        events = data.get("traceEvents", [])
        # device lanes: pid names containing "TPU" / "/device:"
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
            name = ev.get("name", "?")
            agg[name] += ev.get("dur", 0.0)
            count[name] += 1
    return agg, count


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="8b", choices=["1b", "8b"])
    ap.add_argument("--paged", action="store_true")
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--fused", type=int, default=1)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument(
        "--kind", default="greedy",
        help="sampler_kind for the contiguous path (greedy matches what the "
             "engine statically selects for temperature=0 benches; 'auto' "
             "adds a lax.cond + full-sampling branch the bench never runs)",
    )
    ap.add_argument("--kv-bucket", type=int, default=256)
    ap.add_argument(
        "--tiles", default="",
        help="decode tile overrides: k,n,bn,bk[;k,n,bn,bk...] — in-model "
             "per-kernel A/B via the trace rows",
    )
    args = ap.parse_args()
    if args.tiles:
        import pie_tpu.ops.quant_matmul_pallas as qmp

        for spec in args.tiles.split(";"):
            k, n, bn, bk = map(int, spec.split(","))
            qmp.DECODE_TILES[(k, n)] = (bn, bk)
        print("tile overrides:", qmp.DECODE_TILES, flush=True)

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
    if not args.fused:
        model._ablate = frozenset({"nofusedmlp"})
    params = model.init_quantized_params(jax.random.PRNGKey(0), 64, 4)

    if args.paged:
        from pie_tpu.engine.scheduler import PagedEngine, Scheduler

        eng = PagedEngine(
            model, params, num_lanes=args.lanes, num_pages=112,
            max_pages_per_seq=12, kv_quantized=True,
        )
        sched = Scheduler(eng, decode_steps=16)
        prompt = list(range(1, 65))
        # max_new must fit the per-seq page budget (12 pages x 64)
        budget = 12 * 64 - len(prompt) - 8
        seqs = [
            sched.add_request(prompt, max_new_tokens=budget, temperature=0.0)
            for _ in range(args.lanes)
        ]
        for _ in range(6):
            sched.step()  # warm + reach steady decode
        assert all(s.status.value == "decoding" for s in seqs), [
            s.finish_reason for s in seqs
        ]

        def run_some():
            for _ in range(args.steps // 16):
                sched.step()
            return None
    else:
        from pie_tpu.engine.core import EngineCore, PenaltyParams
        from pie_tpu.ops.sampling import SamplingParams

        core = EngineCore(model, params, batch_size=1, max_seq_len=512)
        state = core.new_state()
        sampling = SamplingParams.make(1, temperature=0.0)
        penalties = PenaltyParams.make(1)
        bias_ids = jnp.full((1, 1), -1, jnp.int32)
        bias_vals = jnp.zeros((1, 1), jnp.float32)
        stop_ids = jnp.full((4,), -1, jnp.int32)
        ids = jnp.arange(1, 65, dtype=jnp.int32)[None, :]
        state, tok, _ = core._prefill(
            params, state, ids, jnp.array([64]), jnp.array([0]), sampling,
            penalties, bias_ids, bias_vals,
        )
        box = {"state": state}

        def chunk():
            st, outs = core._decode(
                params, box["state"], sampling, penalties, bias_ids,
                bias_vals, stop_ids, num_steps=args.steps,
                sampler_kind=args.kind, kv_bucket=args.kv_bucket,
            )
            box["state"] = st
            return outs

        outs = chunk()
        np.asarray(outs[0])  # warm/compile

        def run_some():
            return np.asarray(chunk()[0])

    td = tempfile.mkdtemp(prefix="jaxtrace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(td):
        run_some()
    wall = time.perf_counter() - t0
    print(f"traced {args.steps} steps in {wall*1e3:.1f} ms wall", flush=True)

    agg, count = _aggregate(td, args.steps)
    total = sum(agg.values())
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]
    print(f"{'op':<58} {'total us':>10} {'n':>6} {'us/step':>9} {'%':>6}")
    for name, us in rows:
        print(
            f"{name[:58]:<58} {us:>10.0f} {count[name]:>6}"
            f" {us/args.steps:>9.1f} {100*us/max(total,1e-9):>6.1f}"
        )
    print(f"device total: {total/1e3:.2f} ms "
          f"({total/args.steps:.0f} us/step)")


if __name__ == "__main__":
    main()
