"""Same-process A/B of decode-step variants, device-timed via traces.

The chip's regime drifts up to ~4% BETWEEN processes (shared tenancy), so
only deltas measured inside one process are conclusive (PROFILE.md). This
harness builds the model once, then for each named variant rebuilds the
EngineCore (each core owns its own jit cache, so module-level flags take
effect), traces a decode chunk, and reports device totals in A/B/A/B order.

Also numerically cross-checks each variant's first-chunk tokens against the
baseline (a perf knob must never change tokens).

Usage: python benchmarks/ab_decode.py --model 8b --variants base,ln0,tiles4k
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
    top = max(agg.items(), key=lambda kv: kv[1])
    return top[1] / steps


VARIANTS = {}


def variant(name):
    def deco(f):
        VARIANTS[name] = f
        return f
    return deco


@variant("base")
def _v_base(qmp):
    qmp.DECODE_TILES.clear()
    qmp.LN_BLOCKSPEC = 1


@variant("ln0")
def _v_ln0(qmp):
    qmp.DECODE_TILES.clear()
    qmp.LN_BLOCKSPEC = 0


@variant("tiles4k")
def _v_tiles4k(qmp):
    # bn=4096 decode tiles for the two MLP streams (fit only after the
    # decode-aware VMEM temporaries model)
    qmp.DECODE_TILES.clear()
    qmp.DECODE_TILES[(4096, 28672)] = (4096, 2048)
    qmp.DECODE_TILES[(14336, 4096)] = (4096, 2048)
    qmp.LN_BLOCKSPEC = 1


@variant("tiles4k_all")
def _v_tiles4k_all(qmp):
    qmp.DECODE_TILES.clear()
    qmp.DECODE_TILES[(4096, 28672)] = (4096, 2048)
    qmp.DECODE_TILES[(14336, 4096)] = (4096, 2048)
    qmp.DECODE_TILES[(4096, 6144)] = (3072, 4096)
    qmp.DECODE_TILES[(4096, 4096)] = (4096, 4096)
    qmp.LN_BLOCKSPEC = 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="8b", choices=["1b", "8b"])
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--variants", default="base,ln0")
    args = ap.parse_args()

    import pie_tpu.ops.quant_matmul_pallas as qmp
    from pie_tpu.engine.core import EngineCore, PenaltyParams
    from pie_tpu.models.llama import LlamaConfig, LlamaModel
    from pie_tpu.ops.sampling import SamplingParams

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

    names = args.variants.split(",")
    runs = {n: [] for n in names}
    tokens = {}

    def run_variant(name):
        VARIANTS[name](qmp)
        # the module-level jits cache their jaxprs process-wide: flag flips
        # only take effect after clearing them (a new EngineCore clears the
        # OUTER decode jit, not these inner ones)
        qmp.quant_matmul_stacked.clear_cache()
        qmp.quant_matmul_pallas.clear_cache()
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
                sampler_kind="greedy", kv_bucket=256,
            )
            box["state"] = st
            return np.asarray(outs[0])

        toks = chunk()  # compile + warm
        us = device_total_us(chunk, args.steps)
        return us, toks

    for rep in range(args.reps):
        for name in names:
            t0 = time.perf_counter()
            us, toks = run_variant(name)
            runs[name].append(us)
            if name not in tokens:
                tokens[name] = toks
            wall = time.perf_counter() - t0
            print(f"[rep {rep}] {name:<12} {us:8.1f} us/step "
                  f"(wall {wall:.1f}s)", flush=True)

    base_toks = tokens.get("base")
    print("\nvariant       us/step (each rep)        vs base   tokens")
    base_mean = np.mean(runs.get("base", [1.0]))
    for name in names:
        vals = ", ".join(f"{v:.0f}" for v in runs[name])
        rel = np.mean(runs[name]) / base_mean
        match = (
            "=" if base_toks is not None
            and np.array_equal(tokens[name], base_toks) else "DIFF"
        )
        print(f"{name:<12} [{vals}]  {rel:7.4f}   {match}")


if __name__ == "__main__":
    main()
