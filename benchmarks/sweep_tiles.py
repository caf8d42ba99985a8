"""Tile-size sweep for the decode quant matmul, with HONEST sync (host
fetch — block_until_ready is a no-op over the axon tunnel).

Usage: python benchmarks/sweep_tiles.py [--shape lm_head|wgu|wd|wqkv|wo]
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBPS = 819.0

SHAPES = {  # llama-3-8b decode shapes
    "wqkv": (4096, 6144),
    "wo": (4096, 4096),
    "wgu": (4096, 28672),
    "wd": (14336, 4096),
    "lm_head": (4096, 128256),
    # llama-3.2-1b decode shapes
    "wqkv1b": (2048, 3072),
    "wo1b": (2048, 2048),
    "wgu1b": (2048, 16384),
    "wd1b": (8192, 2048),
    "lm_head1b": (2048, 128256),
}


def sync(r):
    return float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])


def bench_tiles(qt, x, bn, bk):
    """Differential timing (see prof_decode.bench_op): the ~20 ms axon
    fetch round-trip cancels between two scan lengths."""
    from pie_tpu.ops.quant_matmul_pallas import quant_matmul_pallas
    from benchmarks.prof_decode import bench_op

    def op(c, qt):
        return quant_matmul_pallas(c, qt, bn=bn, bk=bk)

    return bench_op(op, x, qt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="lm_head")
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--group", type=int, default=64)
    ap.add_argument("--bns", default="1024,2048,4096,8192")
    ap.add_argument("--bks", default="512,1024,2048,4096")
    args = ap.parse_args()

    from pie_tpu.ops.quant import quantize

    K, N = SHAPES[args.shape]
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.02
    qt = quantize(w, args.group, args.bits)
    qt = jax.tree.map(jax.device_put, qt)
    x = jnp.ones((1, qt.padded_k), jnp.bfloat16)
    nbytes = (
        qt.packed.size * 4
        + qt.scales.size * qt.scales.dtype.itemsize
        + qt.biases.size * qt.biases.dtype.itemsize
    )
    print(f"shape={args.shape} K={K} N={N} bytes={nbytes/1e6:.0f}MB")
    results = []
    for bn, bk in itertools.product(
        [int(v) for v in args.bns.split(",")],
        [int(v) for v in args.bks.split(",")],
    ):
        if bn > N or bk > qt.padded_k:
            continue
        try:
            dt = bench_tiles(qt, x, bn, bk)
        except Exception as e:  # Mosaic compile failures on bad tiles
            print(f"bn={bn:>5} bk={bk:>5}  FAIL {type(e).__name__}")
            continue
        gbs = nbytes / dt / 1e9
        results.append((gbs, bn, bk))
        print(
            f"bn={bn:>5} bk={bk:>5}  {dt*1e6:>8.1f} us  {gbs:>6.1f} GB/s"
            f"  frac={gbs/HBM_GBPS:.3f}", flush=True,
        )
    if results:
        results.sort(reverse=True)
        g, bn, bk = results[0]
        print(f"\nbest: bn={bn} bk={bk} -> {g:.1f} GB/s ({g/HBM_GBPS:.3f})")


if __name__ == "__main__":
    main()
