"""Same-process A/B of the paged-attention page-walk depth (PIE_PAGED_PPI).

Builds the 8-lane paged engine at a target context, then for each
pages-per-iteration value clears the paged-attention jit caches, rebuilds
the engine (fresh chunk jit), and device-times the decode-only chunk via a
profiler trace. A/B/A/B ordering inside ONE process — the only trustworthy
comparison on this shared chip (PROFILE.md).

Usage: python benchmarks/ab_paged.py [--ctx 1920] [--ppis 1,2,4]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from trace_decode import _aggregate  # type: ignore


def device_total_us(fn, steps: int) -> float:
    td = tempfile.mkdtemp(prefix="jaxtrace_")
    with jax.profiler.trace(td):
        fn()
    agg, _ = _aggregate(td, steps)
    return max(agg.values()) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="8b", choices=["1b", "8b"])
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=1920)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--ppis", default="1,2,4")
    args = ap.parse_args()

    import pie_tpu.ops.paged_attention as pa
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
    print("params ready", flush=True)

    b = args.lanes
    mpps = args.ctx // 64 + 4
    pages = b * mpps + 8

    def run_ppi(ppi: int):
        pa.PAGE_PPI = ppi
        pa.paged_attention_decode.clear_cache()
        pa.paged_attention_decode_stacked.clear_cache()
        eng = PagedEngine(
            model, params, num_lanes=b, num_pages=pages,
            max_pages_per_seq=mpps, kv_quantized=True,
        )
        sched = Scheduler(eng, decode_steps=args.steps, prefix_cache=False)
        prompt = list(range(1, args.ctx - args.steps * 4))
        budget = mpps * 64 - len(prompt) - 8
        seqs = [
            sched.add_request(prompt, max_new_tokens=budget, temperature=0.0)
            for _ in range(b)
        ]
        for _ in range(400):
            if all(s.status.value == "decoding" for s in seqs):
                break
            sched.step()
        emitted = []
        while int(min(sched.context_lens)) < args.ctx:
            sched.step()

        def chunk():
            sched.step()

        chunk()  # warm at this ctx
        us = device_total_us(chunk, args.steps)
        toks = np.concatenate([np.asarray(s.output_ids[:64]) for s in seqs])
        return us, toks

    names = [int(x) for x in args.ppis.split(",")]
    runs = {n: [] for n in names}
    tokens = {}
    for rep in range(args.reps):
        for ppi in names:
            t0 = time.perf_counter()
            us, toks = run_ppi(ppi)
            runs[ppi].append(us)
            tokens.setdefault(ppi, toks)
            print(f"[rep {rep}] ppi={ppi}  {us:8.1f} us/step  "
                  f"(wall {time.perf_counter()-t0:.1f}s)", flush=True)

    base = np.mean(runs[names[0]])
    print("\nppi   us/step (reps)        vs first   tokens")
    for ppi in names:
        vals = ", ".join(f"{v:.0f}" for v in runs[ppi])
        match = (
            "=" if np.array_equal(tokens[ppi], tokens[names[0]]) else "DIFF"
        )
        print(f"{ppi:<4} [{vals}]  {np.mean(runs[ppi])/base:7.4f}   {match}")


if __name__ == "__main__":
    main()
