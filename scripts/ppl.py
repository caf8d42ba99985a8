"""WikiText-2 perplexity harness — the charter quality gate (SURVEY.md §6:
WikiText-2 PPL Δ <= 0.05 between INT4(g=64) and the reference MLX INT4 at
the same bits/group).

Usage (real checkpoint, local snapshot dir — the box has no egress):

  python scripts/ppl.py --model-path /path/to/Llama-3.2-1B \
      --data /path/to/wikitext-2-raw/wiki.test.raw \
      --variants bf16,int8,int4 --seq-len 2048 --gate 0.05

Computes token-level perplexity over non-overlapping windows (the standard
protocol MLX-LM's `mlx_lm.evaluate` uses) for each weight variant, plus an
MLX-layout interchange check: INT4 weights round-tripped through the
reference's packing (`quantize_mlx_layout` -> `from_mlx_layout`,
pie_tpu/ops/quant.py:236-299) must give bit-identical codes, hence identical
PPL — proving our INT4 arithmetic matches MLX group-affine semantics
(reference models/utils.py:95-111 nn.quantize hookup).

All pieces are importable; tests/test_ppl.py exercises them on a tiny
random model so the harness itself is covered without a checkpoint.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def window_nll(model, params, ids: jax.Array, lens: jax.Array):
    """Summed next-token negative log-likelihood over a padded window.

    ids: [B, T] int32; lens: [B] valid lengths. Returns (nll_sum, count):
    teacher-forced cross-entropy of positions 1..len-1 (f32 logits).
    """
    from pie_tpu.cache.kv_cache import make_kv_cache

    cfg = model.config
    b, t = ids.shape
    cache = make_kv_cache(
        cfg.num_hidden_layers, b, t, cfg.num_key_value_heads,
        cfg.resolved_head_dim, dtype=jnp.bfloat16,
    )
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    cache = cache.advance(jnp.zeros((b,), jnp.int32), t)
    logits, _ = model(params, ids, cache, positions)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mask = jnp.arange(1, t)[None, :] < lens[:, None]
    return (nll * mask).sum(), mask.sum()


def compute_ppl(
    model, params, token_ids: np.ndarray, seq_len: int = 2048,
    progress=None,
) -> float:
    """Perplexity over non-overlapping ``seq_len`` windows of a token
    stream."""
    fn = jax.jit(functools.partial(window_nll, model))
    n = len(token_ids)
    total_nll = 0.0
    total_cnt = 0
    for start in range(0, n, seq_len):
        chunk = np.asarray(token_ids[start : start + seq_len], np.int32)
        ln = len(chunk)
        if ln < 2:
            break
        padded = np.zeros((1, seq_len), np.int32)
        padded[0, :ln] = chunk
        nll, cnt = fn(params, jnp.asarray(padded), jnp.asarray([ln], jnp.int32))
        total_nll += float(nll)
        total_cnt += int(cnt)
        if progress:
            progress(start + ln, n)
    return float(np.exp(total_nll / max(total_cnt, 1)))


def quantize_variant(model, params, variant: str):
    """Return params for a named weight variant."""
    if variant == "bf16":
        return params
    if variant == "int8":
        return model.quantize_params(params, group_size=64, bits=8)
    if variant == "int4":
        return model.quantize_params(params, group_size=64, bits=4)
    raise ValueError(f"unknown variant {variant!r}")


def mlx_roundtrip_params(model, params, group_size: int = 64, bits: int = 4):
    """INT4-quantize through the REFERENCE's MLX packing and back: quantize
    each linear [K, N] as MLX does ([N, K] along K), then convert the MLX
    layout into our tile-strided layout. Codes/scales/biases are the same
    numbers, so PPL must match our direct ``quantize_params`` exactly.
    (Projection fusion concatenates along N, which leaves per-column K-group
    qparams untouched — fused and unfused INT4 are bit-identical.)"""
    import inspect

    from pie_tpu.ops.quant import from_mlx_layout, quantize_mlx_layout

    def q_via_mlx(w_kn):
        packed, scales, biases = quantize_mlx_layout(
            w_kn.swapaxes(-1, -2), group_size, bits
        )
        return from_mlx_layout(packed, scales, biases, group_size, bits)

    kw = {}
    if "fuse_projections" in inspect.signature(
        model.quantize_params
    ).parameters:
        kw["fuse_projections"] = False
    out = dict(model.quantize_params(params, group_size, bits, **kw))
    layers = dict(out["layers"])
    for name in model.LINEAR_KEYS:
        w = params["layers"][name]  # [L, K, N] bf16 source
        layers[name] = jax.vmap(q_via_mlx)(w.astype(jnp.float32))
    out["layers"] = layers
    if "lm_head" in params:
        out["lm_head"] = q_via_mlx(params["lm_head"].astype(jnp.float32))
    return out


def load_wikitext(path: str) -> str:
    with open(path, encoding="utf-8") as f:
        return f.read()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--data", required=True, help="wiki.test.raw text file")
    ap.add_argument("--variants", default="bf16,int4")
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--max-tokens", type=int, default=0,
                    help="truncate the eval stream (0 = full)")
    ap.add_argument("--gate", type=float, default=0.0,
                    help="fail if PPL(int4) - PPL(bf16) exceeds this")
    ap.add_argument("--check-mlx-layout", action="store_true")
    args = ap.parse_args()

    from pie_tpu.models.loader import load_model
    from pie_tpu.tokenizer import load_tokenizer

    model, params = load_model(args.model_path, dtype=jnp.bfloat16)
    tok = load_tokenizer(args.model_path)
    text = load_wikitext(args.data)
    ids = np.asarray(tok.encode(text, add_bos=True), np.int64)
    if args.max_tokens:
        ids = ids[: args.max_tokens]
    print(f"eval stream: {len(ids)} tokens", file=sys.stderr)

    results = {}
    for variant in args.variants.split(","):
        vp = quantize_variant(model, params, variant)

        def prog(done, total):
            print(f"  {variant}: {done}/{total}", end="\r", file=sys.stderr)

        ppl = compute_ppl(model, vp, ids, args.seq_len, progress=prog)
        results[variant] = round(ppl, 4)
        print(f"\n{variant}: ppl={ppl:.4f}", file=sys.stderr)
        del vp

    if args.check_mlx_layout:
        vp = mlx_roundtrip_params(model, params)
        ppl = compute_ppl(model, vp, ids, args.seq_len)
        results["int4_mlx_layout"] = round(ppl, 4)
        print(f"int4 via MLX layout: ppl={ppl:.4f}", file=sys.stderr)
        del vp

    print(json.dumps(results))
    if args.gate and "int4" in results and "bf16" in results:
        delta = results["int4"] - results["bf16"]
        print(f"gate: delta={delta:.4f} (<= {args.gate})", file=sys.stderr)
        if delta > args.gate:
            sys.exit(1)


if __name__ == "__main__":
    main()
