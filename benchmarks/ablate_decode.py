"""Decode-step ablation runner: measures e2e decode tok/s for a geometry
under each ablation setting (separate process per setting — the ablation
set is read at trace time via the bench-only ``_ablate`` attributes on
LlamaModel / EngineCore; production code never consults it).

Usage: python benchmarks/ablate_decode.py [--model 1b|8b]
"""

import argparse
import json
import os
import subprocess
import sys

ABLATIONS = [
    "",
    "noattn",
    "norope",
    "noproc",
    "nosample",
    "noproc,nosample",
    "nohead",
    "noattn,norope,noproc,nosample",  # matmul+norm floor
]

CHILD = r"""
import sys, time, json
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import bench as B

geom = sys.argv[1]
ablate = frozenset(filter(None, sys.argv[2].split(",")))
config = B.llama3_8b_config() if geom == "8b" else B.llama32_1b_config()
from pie_tpu.engine import InferenceEngine
from pie_tpu.models.llama import LlamaModel

model = LlamaModel(config)
model._ablate = ablate
params = model.init_quantized_params(jax.random.PRNGKey(0), 64, 4)
engine = InferenceEngine(model=model, params=params,
                         max_seq_len=1024 if geom == "8b" else 512,
                         decode_chunk=64)
engine.core._ablate = ablate
steps = 129 if geom == "8b" else 257
tok_s = B.bench_decode(engine, list(range(1, 65)), steps, 64)
print(json.dumps({"tok_s": round(tok_s, 2)}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="8b", choices=["1b", "8b"])
    args = ap.parse_args()
    results = {}
    for ab in ABLATIONS:
        try:
            out = subprocess.run(
                [sys.executable, "-c", CHILD, args.model, ab],
                env=dict(os.environ), capture_output=True, text=True,
                timeout=900,
            )
        except subprocess.TimeoutExpired:
            print(f"{ab or 'full':>24}: TIMEOUT", flush=True)
            results[ab or "full"] = None
            continue
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
        try:
            tok = json.loads(line)["tok_s"]
        except Exception:
            tok = None
            print(out.stderr[-500:], file=sys.stderr)
        results[ab or "full"] = tok
        ms = 1000.0 / tok if tok else float("nan")
        print(f"{ab or 'full':>24}: {tok} tok/s = {ms:.3f} ms/tok", flush=True)
    if results.get("full"):
        full = 1000.0 / results["full"]
        for ab, tok in results.items():
            if ab != "full" and tok:
                print(f"  {ab} saves {full - 1000.0/tok:.3f} ms")


if __name__ == "__main__":
    main()
